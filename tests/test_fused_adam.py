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


# ---- fused_train_step: full training-step parity vs the dense path ---------

from anime_recommendations_tpu.train.fused import fused_train_step
from anime_recommendations_tpu.train.trainer import init_train_state, train_step


def _batch(n_users, n_anime, b, seed):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(0, n_users, b), jnp.int32),
        jnp.asarray(rng.integers(0, n_anime, b), jnp.int32),
        jnp.asarray(rng.uniform(0, 1, b), jnp.float32),
        jnp.ones(b, jnp.float32),
    )


def test_fused_train_step_matches_dense_trajectory():
    """Chained fused steps track the dense train_step: params, moments, BN,
    reported loss (incl. the L2 regularizer's value) and mse."""
    n_users, n_anime, d, b, l2 = 150, 40, 16, 64, 1e-4
    lr = jnp.float32(1e-3)
    sf = init_train_state(jax.random.PRNGKey(0), n_users, n_anime, d)
    sd = init_train_state(jax.random.PRNGKey(0), n_users, n_anime, d)
    for step in range(4):
        u, a, r, w = _batch(n_users, n_anime, b, seed=step)
        sd, loss_d, mse_d = train_step(sd, u, a, r, w, lr, l2)
        sf, loss_f, mse_f = fused_train_step(sf, u, a, r, w, lr, l2)
        np.testing.assert_allclose(float(loss_f), float(loss_d),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(mse_f), float(mse_d),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sf.params.user_emb),
                               np.asarray(sd.params.user_emb),
                               rtol=3e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sf.params.anime_emb),
                               np.asarray(sd.params.anime_emb),
                               rtol=3e-3, atol=2e-5)
    np.testing.assert_allclose(np.asarray(sf.params.dense_w),
                               np.asarray(sd.params.dense_w),
                               rtol=1e-3, atol=1e-5)
    # moving_mean is near zero; rtol is meaningless there — bound absolutely.
    np.testing.assert_allclose(np.asarray(sf.bn_state.moving_mean),
                               np.asarray(sd.bn_state.moving_mean),
                               rtol=1e-3, atol=5e-6)
    assert int(sf.opt_state.count) == int(sd.opt_state.count) == 4


def test_fused_adam_in_device_loop_epoch():
    """optimizer='fused_adam' inside the device-resident epoch scan matches
    the dense epoch's loss curve (same data, shuffle off)."""
    from anime_recommendations_tpu.data.dataset import RatingsDataset
    from anime_recommendations_tpu.train import device_loop as dl

    rng = np.random.default_rng(3)
    n_users, n_anime, d, batch, rows, l2 = 120, 30, 8, 50, 400, 1e-4
    ds = RatingsDataset(
        users=rng.integers(0, n_users, rows).astype(np.int32),
        anime=rng.integers(0, n_anime, rows).astype(np.int32),
        ratings=rng.uniform(0, 1, rows).astype(np.float32),
    )
    data = dl.stage(ds, batch, seed=None)
    key = jax.random.PRNGKey(0)
    lr = jnp.float32(1e-3)
    out = {}
    for opt in ("adam", "fused_adam"):
        st = init_train_state(jax.random.PRNGKey(1), n_users, n_anime, d)
        st, losses, mses, wsums = dl.train_epoch(
            st, data, key, lr, batch, l2, shuffle=False, optimizer=opt
        )
        out[opt] = (np.asarray(losses), np.asarray(st.params.user_emb))
    np.testing.assert_allclose(out["fused_adam"][0], out["adam"][0],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(out["fused_adam"][1], out["adam"][1],
                               rtol=3e-3, atol=2e-5)


@pytest.mark.parametrize("precision,tol", [("highest", 0.0), ("fast", 2e-5)])
def test_pipelined_gather_matches_direct(precision, tol):
    """The next_ids variant returns exactly w'[next_ids] (ragged last block
    included — its garbage rows must not leak into the contraction)."""
    w, mu, nu, ids, g = make_case(300, 32, 128, seed=4)
    rng = np.random.default_rng(7)
    nids = jnp.asarray(rng.integers(0, 300, 200), np.int32)
    w2, mu2, nu2, sumsq, rows = sparse_adam_update(
        w, mu, nu, ids, g, jnp.asarray(3), jnp.float32(1e-3), l2=1e-4,
        block_rows=64, chunk=32, next_ids=nids, precision=precision,
    )
    # Table outputs identical to the gather-free call.
    w2b, mu2b, nu2b, sumsqb = sparse_adam_update(
        w, mu, nu, ids, g, jnp.asarray(3), jnp.float32(1e-3), l2=1e-4,
        block_rows=64, chunk=32, precision=precision,
    )
    np.testing.assert_array_equal(np.asarray(w2), np.asarray(w2b))
    np.testing.assert_allclose(float(sumsq), float(sumsqb), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rows), np.asarray(w2[nids]), rtol=tol, atol=tol
    )
    assert not np.isnan(np.asarray(rows)).any()


def test_bf16_moments_match_dense_with_bf16_rounding():
    """mu/nu stored bf16 (fused_adam_bf16m): kernel outputs equal the dense
    reference's f32 moments rounded to bf16, and the weight update stays
    within the f32 update's neighborhood (one bf16 moment-read of rounding
    on top of the fast-scatter tolerance)."""
    w, mu, nu, ids, g = make_case(300, 32, 128, seed=4)
    mu_b = mu.astype(jnp.bfloat16)
    nu_b = nu.astype(jnp.bfloat16)
    t, lr, l2 = 3, jnp.float32(1e-3), 1e-4
    # Reference: identical math from the bf16-rounded starting moments.
    w_ref, mu_ref, nu_ref = dense_reference(
        w, mu_b.astype(jnp.float32), nu_b.astype(jnp.float32), ids, g, t,
        lr, l2,
    )
    w2, mu2, nu2, sumsq = sparse_adam_update(
        w, mu_b, nu_b, ids, g, jnp.asarray(t), lr, l2=l2, b1=B1, b2=B2,
        eps=EPS, block_rows=64, chunk=32, precision="highest",
    )
    assert mu2.dtype == jnp.bfloat16 and nu2.dtype == jnp.bfloat16
    # Equal to within one bf16 ulp (2^-8 relative): the kernel's one-hot-
    # matmul scatter and XLA's scatter-add can differ by an f32 ulp, which
    # flips the bf16 rounding at exact-boundary values.
    np.testing.assert_allclose(
        np.asarray(mu2, np.float32),
        np.asarray(mu_ref.astype(jnp.bfloat16), np.float32),
        rtol=1 / 128, atol=1e-9,
    )
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref), rtol=5e-5,
                               atol=5e-6)
    np.testing.assert_allclose(
        float(sumsq), float(jnp.sum(jnp.square(w))), rtol=1e-5
    )


def test_trainer_fused_adam_bf16m_fits():
    """End-to-end: the bf16-moment optimizer trains through the device-loop
    epoch path, loss decreases, and the state carries bf16 table moments."""
    from anime_recommendations_tpu.data.dataset import RatingsDataset
    from anime_recommendations_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    n_users, n_anime, n = 300, 120, 40_000
    U = rng.normal(size=(n_users, 4))
    V = rng.normal(size=(n_anime, 4))
    users = rng.integers(0, n_users, n)
    anime = rng.integers(0, n_anime, n)
    y = (1 / (1 + np.exp(-np.einsum("ij,ij->i", U[users], V[anime])))).astype(
        np.float32
    )
    train = RatingsDataset(users[:36_000].astype(np.int32),
                           anime[:36_000].astype(np.int32), y[:36_000])
    holdout = RatingsDataset(users[36_000:].astype(np.int32),
                             anime[36_000:].astype(np.int32), y[36_000:])
    result = Trainer(
        optimizer="fused_adam_bf16m", embedding_size=16, batch_size=2_000,
        epochs=3, patience=3, start_lr=1e-3, max_lr=3e-3, min_lr=1e-3,
        rampup_epochs=1, l2_reg_factor=1e-5, verbose=False,
    ).fit(train, holdout, n_users, n_anime)
    hist = result.history
    assert hist["loss"].iloc[-1] < hist["loss"].iloc[0]
    assert result.state.opt_state.mu.user_emb.dtype == jnp.bfloat16
    assert result.state.opt_state.nu.anime_emb.dtype == jnp.bfloat16
    # Scalar-head moments stay f32.
    assert result.state.opt_state.mu.dense_w.dtype == jnp.float32
