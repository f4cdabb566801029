"""LazyAdam (row-sparse) training path vs the dense exact-parity path."""

import jax
import jax.numpy as jnp
import numpy as np

from anime_recommendations_tpu.train.lazy import lazy_row_adam, lazy_train_step
from anime_recommendations_tpu.train.trainer import (
    Trainer,
    init_train_state,
    train_step,
)
from tests.test_sharded_trainer import make_ds


def test_first_step_matches_dense_on_touched_rows():
    # Fresh state, l2=0: dense Adam's update is zero on untouched rows
    # (mu=nu=0), so the first lazy step must match the dense step exactly
    # on every row.
    rng = np.random.default_rng(0)
    n_users, n_anime, d, b = 60, 40, 8, 32
    users = jnp.asarray(rng.integers(0, n_users, b), jnp.int32)
    anime = jnp.asarray(rng.integers(0, n_anime, b), jnp.int32)
    ratings = jnp.asarray(rng.uniform(0, 1, b), jnp.float32)
    weights = jnp.ones(b, jnp.float32)
    lr = jnp.float32(1e-3)

    s0 = init_train_state(jax.random.PRNGKey(1), n_users, n_anime, d)
    s_dense, loss_d, mse_d = train_step(
        jax.tree.map(jnp.copy, s0), users, anime, ratings, weights, lr, 0.0
    )
    s_lazy, loss_l, mse_l = lazy_train_step(
        jax.tree.map(jnp.copy, s0), users, anime, ratings, weights, lr, 0.0
    )
    np.testing.assert_allclose(float(loss_l), float(loss_d), rtol=1e-6)
    np.testing.assert_allclose(float(mse_l), float(mse_d), rtol=1e-6)
    for a, b_ in zip(jax.tree.leaves(s_dense.params), jax.tree.leaves(s_lazy.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=1e-7)
    assert int(s_lazy.opt_state.count) == 1


def test_untouched_rows_frozen():
    rng = np.random.default_rng(1)
    n_users, n_anime, d, b = 50, 30, 8, 16
    users = jnp.asarray(rng.integers(0, 20, b), jnp.int32)   # rows 20+ untouched
    anime = jnp.asarray(rng.integers(0, 10, b), jnp.int32)
    ratings = jnp.asarray(rng.uniform(0, 1, b), jnp.float32)
    weights = jnp.ones(b, jnp.float32)

    state = init_train_state(jax.random.PRNGKey(2), n_users, n_anime, d)
    w_before = np.asarray(state.params.user_emb).copy()
    for t in range(3):
        state, _, _ = lazy_train_step(
            state, users, anime, ratings, weights, jnp.float32(1e-2), 1e-4
        )
    w_after = np.asarray(state.params.user_emb)
    np.testing.assert_array_equal(w_after[20:], w_before[20:])
    assert np.abs(w_after[:20] - w_before[:20]).max() > 0


def test_duplicate_ids_single_update_per_row():
    # All batch entries hit ONE row: lazy must apply exactly one Adam update
    # with the SUMMED gradient (not B sequential updates).
    rng = np.random.default_rng(2)
    n, d, b = 16, 4, 8
    w = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    mu = jnp.zeros((n, d), jnp.float32)
    nu = jnp.zeros((n, d), jnp.float32)
    ids = jnp.zeros(b, jnp.int32)
    g = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    out = lazy_row_adam(w, mu, nu, ids, g, jnp.asarray(1), jnp.float32(1e-2), 0.0)
    g_sum = np.asarray(g).sum(axis=0)
    mu_exp = 0.1 * g_sum
    np.testing.assert_allclose(np.asarray(out.mu[0]), mu_exp, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.mu[1:]), np.zeros((n - 1, d)))


def test_lazy_converges_like_dense():
    train, holdout, n_users, n_anime = make_ds(n=6000, seed=5)
    kwargs = dict(
        embedding_size=16, batch_size=512, epochs=8, patience=8,
        start_lr=3e-3, max_lr=1e-2, min_lr=3e-3, rampup_epochs=2,
        l2_reg_factor=1e-6, verbose=False, device_loop=True,
    )
    dense = Trainer(optimizer="adam", **kwargs).fit(
        train, holdout, n_users, n_anime
    )
    lazy = Trainer(optimizer="lazy_adam", **kwargs).fit(
        train, holdout, n_users, n_anime
    )
    # Same model family, same data: final validation quality must be
    # comparable (lazy is a different optimizer, not a different model).
    assert lazy.history["val_mse"].iloc[-1] < dense.history["val_mse"].iloc[0]
    assert (
        lazy.history["val_mse"].iloc[-1]
        < dense.history["val_mse"].iloc[-1] * 1.2 + 5e-3
    )
