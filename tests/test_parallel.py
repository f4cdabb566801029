"""Multi-chip SPMD parity on the 8-device virtual CPU mesh.

The sharded train/eval steps must reproduce the single-chip math exactly
(global-batch BatchNorm makes this bit-compatible; SURVEY.md hard part (d)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anime_recommendations_tpu.models import two_tower as tt
from anime_recommendations_tpu.parallel.mesh import make_mesh, pad_table
from anime_recommendations_tpu.parallel.sharded_train import (
    ShardedTrainStep,
    place_state,
)
from anime_recommendations_tpu.train.trainer import (
    TrainState,
    eval_step,
    init_train_state,
    make_optimizer,
    train_step,
)

N_USERS, N_ANIME, D, B = 64, 32, 8, 64
L2 = 1e-3


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(5)
    return (
        jnp.asarray(rng.integers(0, N_USERS, B), jnp.int32),
        jnp.asarray(rng.integers(0, N_ANIME, B), jnp.int32),
        jnp.asarray(rng.uniform(0, 1, B), jnp.float32),
        jnp.asarray((rng.random(B) > 0.1), jnp.float32),  # some padding rows
    )


@pytest.fixture(scope="module")
def single_state():
    return init_train_state(jax.random.PRNGKey(0), N_USERS, N_ANIME, D)


def clone_state(state):
    return jax.tree.map(jnp.copy, state)


@pytest.mark.parametrize("mesh_shape,shard_anime", [
    ((4, 2), False),
    ((2, 4), False),
    ((8, 1), False),
    ((1, 8), False),
    ((4, 2), True),
])
def test_sharded_step_matches_single_chip(single_state, batch, mesh_shape, shard_anime):
    users, anime, ratings, weights = batch
    mesh = make_mesh(*mesh_shape)
    step = ShardedTrainStep(mesh, l2_reg_factor=L2, shard_anime=shard_anime)

    sharded = place_state(clone_state(single_state), mesh, shard_anime)
    ref = clone_state(single_state)

    # Gradient parity FIRST (pre-optimizer): this is the exact-math check.
    # (Adam itself amplifies f32 reduction-order noise on near-zero grads
    # into ~sign(grad)*lr flips, so evolved params are not comparable
    # tightly — the per-step loss/mse below covers the full update path.)
    g_sharded = step.grads(sharded, users, anime, ratings, weights)
    g_ref = jax.grad(
        lambda p: tt.loss_and_metrics(
            p, single_state.bn_state, users, anime, ratings, weights, L2, True
        )[0]
    )(single_state.params)
    for leaf_s, leaf_r in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(leaf_s), np.asarray(leaf_r), atol=1e-5, rtol=1e-4
        )

    lr = jnp.float32(0.01)
    for i in range(3):
        sharded, s_loss, s_mse = step.train_step(
            sharded, users, anime, ratings, weights, lr
        )
        ref, r_loss, r_mse = train_step(
            ref, users, anime, ratings, weights, lr, L2
        )
        np.testing.assert_allclose(float(s_loss), float(r_loss), rtol=1e-3, err_msg=f"step {i}")
        np.testing.assert_allclose(float(s_mse), float(r_mse), rtol=1e-3)

    np.testing.assert_allclose(
        float(sharded.bn_state.moving_mean), float(ref.bn_state.moving_mean), atol=1e-3
    )


def test_user_table_actually_sharded(single_state, batch):
    mesh = make_mesh(2, 4)
    step = ShardedTrainStep(mesh, l2_reg_factor=L2)
    sharded = place_state(clone_state(single_state), mesh)
    shard_shapes = {
        s.data.shape for s in sharded.params.user_emb.addressable_shards
    }
    assert shard_shapes == {(N_USERS // 4, D)}
    # Anime table replicated.
    assert {
        s.data.shape for s in sharded.params.anime_emb.addressable_shards
    } == {(N_ANIME, D)}


def test_sharded_eval_matches_single_chip(single_state, batch):
    users, anime, ratings, weights = batch
    mesh = make_mesh(4, 2)
    step = ShardedTrainStep(mesh, l2_reg_factor=L2)
    sharded = place_state(clone_state(single_state), mesh)
    ls, ms, ws = step.eval_sums(
        sharded.params, sharded.bn_state, users, anime, ratings, weights
    )
    rl, rm, rw = eval_step(
        single_state.params, single_state.bn_state, users, anime, ratings,
        weights, L2,
    )
    np.testing.assert_allclose(float(ls), float(rl), rtol=1e-3)
    np.testing.assert_allclose(float(ms), float(rm), rtol=1e-3)
    np.testing.assert_allclose(float(ws), float(rw), rtol=1e-6)


def test_pad_table():
    t = np.ones((10, 4), np.float32)
    out = pad_table(t, 4)
    assert out.shape == (12, 4)
    np.testing.assert_array_equal(out[10:], 0.0)
    assert pad_table(t, 5).shape == (10, 4)


def test_training_converges_on_mesh():
    """A few sharded steps reduce the loss on a learnable problem."""
    rng = np.random.default_rng(0)
    U = rng.normal(size=(N_USERS, 4))
    V = rng.normal(size=(N_ANIME, 4))
    users = rng.integers(0, N_USERS, 4096)
    anime = rng.integers(0, N_ANIME, 4096)
    y = (1 / (1 + np.exp(-np.einsum("ij,ij->i", U[users], V[anime])))).astype(np.float32)

    mesh = make_mesh(4, 2)
    step = ShardedTrainStep(mesh, l2_reg_factor=1e-6)
    state = place_state(init_train_state(jax.random.PRNGKey(1), N_USERS, N_ANIME, 16), mesh)
    losses = []
    lr = jnp.float32(0.02)
    for i in range(30):
        sl = slice((i % 8) * 512, (i % 8) * 512 + 512)
        state, loss, _ = step.train_step(
            state,
            jnp.asarray(users[sl], jnp.int32),
            jnp.asarray(anime[sl], jnp.int32),
            jnp.asarray(y[sl]),
            jnp.ones(512, jnp.float32),
            lr,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.99
