"""Fused sparse-Adam kernel vs the dense optax-equivalent reference."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from anime_recommendations_tpu.ops.fused_adam import sparse_adam_update

B1, B2, EPS = 0.9, 0.999, 1e-7


def dense_reference(w, mu, nu, ids, g_rows, t, lr, l2):
    """Exactly what the trainer's XLA path does: dense grad -> scale_by_adam."""
    dense = jnp.zeros_like(w).at[ids].add(g_rows) + 2.0 * l2 * w
    opt = optax.scale_by_adam(b1=B1, b2=B2, eps=EPS)
    state = optax.ScaleByAdamState(
        count=jnp.asarray(t - 1, jnp.int32), mu=mu, nu=nu
    )
    updates, new_state = opt.update(dense, state, w)
    return w - lr * updates, new_state.mu, new_state.nu


def make_case(n, d, b, seed, dup_heavy=False):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, d)).astype(np.float32) * 0.05
    mu = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    nu = (rng.standard_normal((n, d)).astype(np.float32) * 0.01) ** 2
    hi = max(n // 20, 2) if dup_heavy else n
    ids = rng.integers(0, hi, b).astype(np.int32)
    g = rng.standard_normal((b, d)).astype(np.float32) * 0.1
    return map(jnp.asarray, (w, mu, nu, ids, g))


@pytest.mark.parametrize("precision,tol", [("highest", 5e-6), ("fast", 2e-4)])
@pytest.mark.parametrize("dup_heavy", [False, True])
def test_matches_dense_optax(precision, tol, dup_heavy):
    w, mu, nu, ids, g = make_case(300, 32, 128, seed=0, dup_heavy=dup_heavy)
    t, lr, l2 = 3, jnp.float32(1e-3), 1e-4
    w_ref, mu_ref, nu_ref = dense_reference(w, mu, nu, ids, g, t, lr, l2)
    w2, mu2, nu2, sumsq = sparse_adam_update(
        w, mu, nu, ids, g, jnp.asarray(t), lr, l2=l2, b1=B1, b2=B2, eps=EPS,
        block_rows=64, chunk=32, precision=precision,
    )
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu_ref),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(nu2), np.asarray(nu_ref),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               rtol=tol, atol=tol)
    np.testing.assert_allclose(
        float(sumsq), float(jnp.sum(w * w)), rtol=1e-5
    )


def test_unpadded_shapes_and_step_one():
    # n not a multiple of block_rows; first Adam step (t=1, strongest bias
    # correction); every id in one block (maximal segment skew).
    w, mu, nu, _, g = make_case(100, 16, 64, seed=1)
    mu = jnp.zeros_like(mu)
    nu = jnp.zeros_like(nu)
    ids = jnp.asarray(np.full(64, 7, np.int32))  # all grads on one row
    t, lr, l2 = 1, jnp.float32(1e-2), 0.0
    w_ref, mu_ref, nu_ref = dense_reference(w, mu, nu, ids, g, t, lr, l2)
    w2, mu2, nu2, _ = sparse_adam_update(
        w, mu, nu, ids, g, jnp.asarray(t), lr, l2=l2, b1=B1, b2=B2, eps=EPS,
        block_rows=32, chunk=16, precision="highest",
    )
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-7)
    # nu accumulates 64 duplicate-row squares; matmul vs sequential scatter
    # order differs at the last f32 ulp.
    np.testing.assert_allclose(np.asarray(nu2), np.asarray(nu_ref),
                               rtol=5e-5, atol=1e-9)


def test_sequential_steps_converge_like_dense():
    # Run 5 chained fused steps vs 5 dense steps; trajectories must track.
    w, mu, nu, ids, g = make_case(200, 8, 96, seed=2, dup_heavy=True)
    wf, muf, nuf = w, mu, nu
    wd, mud, nud = w, mu, nu
    for t in range(1, 6):
        wd, mud, nud = dense_reference(wd, mud, nud, ids, g, t,
                                       jnp.float32(1e-3), 1e-4)
        wf, muf, nuf, _ = sparse_adam_update(
            wf, muf, nuf, ids, g, jnp.asarray(t), jnp.float32(1e-3),
            l2=1e-4, b1=B1, b2=B2, eps=EPS, block_rows=64, chunk=32,
            precision="fast",
        )
    np.testing.assert_allclose(np.asarray(wf), np.asarray(wd),
                               rtol=3e-4, atol=3e-5)
