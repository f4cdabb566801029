"""Multi-chip SPMD parity on the 8-device virtual CPU mesh.

The sharded train/eval steps must reproduce the single-chip math exactly
(global-batch BatchNorm makes this bit-compatible; SURVEY.md hard part (d))
— in BOTH routing modes: the production all-to-all row exchange (tables
sharded over the whole mesh) and the legacy psum block all-reduce.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anime_recommendations_tpu.models import two_tower as tt
from anime_recommendations_tpu.parallel import routing as rt
from anime_recommendations_tpu.parallel.mesh import make_mesh, pad_table
from anime_recommendations_tpu.parallel.sharded_train import (
    ShardedTrainStep,
    place_state,
    unstripe_state,
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


def unstripe_grads(grads, mesh, routing):
    if routing != "alltoall":
        return grads
    m = mesh.devices.size
    return grads._replace(
        user_emb=rt.from_physical(np.asarray(grads.user_emb), m),
        anime_emb=rt.from_physical(np.asarray(grads.anime_emb), m),
    )


CASES = [
    ((4, 2), False, "psum"),
    ((2, 4), False, "psum"),
    ((8, 1), False, "psum"),
    ((1, 8), False, "psum"),
    ((4, 2), True, "psum"),
    ((4, 2), False, "alltoall"),
    ((2, 4), False, "alltoall"),
    ((8, 1), False, "alltoall"),
    ((1, 8), False, "alltoall"),
    ((2, 2), False, "alltoall"),
]


@pytest.mark.parametrize("mesh_shape,shard_anime,routing", CASES)
def test_sharded_step_matches_single_chip(
    single_state, batch, mesh_shape, shard_anime, routing
):
    users, anime, ratings, weights = batch
    devices = jax.devices()[: mesh_shape[0] * mesh_shape[1]]
    mesh = make_mesh(*mesh_shape, devices=devices)
    step = ShardedTrainStep(
        mesh, l2_reg_factor=L2, shard_anime=shard_anime, routing=routing
    )

    sharded = place_state(clone_state(single_state), mesh, shard_anime, routing)
    ref = clone_state(single_state)

    # Gradient parity FIRST (pre-optimizer): this is the exact-math check.
    # (Adam itself amplifies f32 reduction-order noise on near-zero grads
    # into ~sign(grad)*lr flips, so evolved params are not comparable
    # tightly — the per-step loss/mse below covers the full update path.)
    g_sharded = unstripe_grads(
        step.grads(sharded, users, anime, ratings, weights), mesh, routing
    )
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
    # Evolved params round-trip through the physical layout consistently.
    host = unstripe_state(sharded, mesh, routing)
    assert host.params.user_emb.shape == (N_USERS, D)


def test_user_table_actually_sharded_psum(single_state, batch):
    mesh = make_mesh(2, 4)
    sharded = place_state(clone_state(single_state), mesh, routing="psum")
    shard_shapes = {
        s.data.shape for s in sharded.params.user_emb.addressable_shards
    }
    assert shard_shapes == {(N_USERS // 4, D)}
    # Anime table replicated.
    assert {
        s.data.shape for s in sharded.params.anime_emb.addressable_shards
    } == {(N_ANIME, D)}


def test_tables_sharded_over_whole_mesh_alltoall(single_state):
    mesh = make_mesh(2, 4)
    sharded = place_state(clone_state(single_state), mesh, routing="alltoall")
    assert {
        s.data.shape for s in sharded.params.user_emb.addressable_shards
    } == {(N_USERS // 8, D)}
    assert {
        s.data.shape for s in sharded.params.anime_emb.addressable_shards
    } == {(N_ANIME // 8, D)}
    # Striped placement: device s's block holds global rows s, s+8, ...
    host = unstripe_state(sharded, mesh, "alltoall")
    np.testing.assert_allclose(
        host.params.user_emb, np.asarray(single_state.params.user_emb)
    )


@pytest.mark.parametrize("routing", ["psum", "alltoall"])
def test_sharded_eval_matches_single_chip(single_state, batch, routing):
    users, anime, ratings, weights = batch
    mesh = make_mesh(4, 2)
    step = ShardedTrainStep(mesh, l2_reg_factor=L2, routing=routing)
    sharded = place_state(clone_state(single_state), mesh, routing=routing)
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


@pytest.mark.parametrize("mesh_shape", [(2, 4), (8, 1)])
def test_sharded_lazy_adam_matches_single_chip(single_state, batch, mesh_shape):
    """Owner-side row-sparse Adam on the routed path vs train/lazy.py.

    Adam's mhat/sqrt(vhat) amplifies f32 reduction-order noise on
    near-zero grads into ~±lr flips, so evolved params are compared
    loosely; the moments (linear/quadratic in the grads) are tight, and
    per-step loss/mse cover the full update path.
    """
    from anime_recommendations_tpu.train.lazy import lazy_train_step

    users, anime, ratings, weights = batch
    mesh = make_mesh(*mesh_shape)
    step = ShardedTrainStep(
        mesh, l2_reg_factor=L2, routing="alltoall", optimizer="lazy_adam"
    )
    sharded = place_state(clone_state(single_state), mesh, routing="alltoall")
    ref = clone_state(single_state)

    lr = jnp.float32(0.01)
    for i in range(3):
        sharded, s_loss, s_mse = step.train_step(
            sharded, users, anime, ratings, weights, lr
        )
        ref, r_loss, r_mse = lazy_train_step(
            ref, users, anime, ratings, weights, lr, L2
        )
        np.testing.assert_allclose(
            float(s_loss), float(r_loss), rtol=1e-3, err_msg=f"step {i}"
        )
        np.testing.assert_allclose(float(s_mse), float(r_mse), rtol=1e-3)

    host = unstripe_state(sharded, mesh, "alltoall")
    m = mesh.devices.size
    ref_host = jax.tree.map(np.asarray, ref)
    # First moments: linear in the grads -> tight parity, row for row.
    np.testing.assert_allclose(
        host.opt_state.mu.user_emb, ref_host.opt_state.mu.user_emb,
        atol=1e-6, rtol=1e-4,
    )
    np.testing.assert_allclose(
        host.opt_state.mu.anime_emb, ref_host.opt_state.mu.anime_emb,
        atol=1e-6, rtol=1e-4,
    )
    # Untouched rows identical (never routed, never decayed).
    touched_u = np.unique(np.asarray(users))
    untouched = np.setdiff1d(np.arange(N_USERS), touched_u)
    np.testing.assert_array_equal(
        host.params.user_emb[untouched],
        np.asarray(single_state.params.user_emb)[untouched],
    )
    np.testing.assert_allclose(
        host.params.user_emb, ref_host.params.user_emb, atol=2e-4
    )
    # BN EMA inherits the head params' Adam flip noise (update magnitude
    # ~lr on near-zero grads); compare to that scale, not f32 eps.
    np.testing.assert_allclose(
        float(host.bn_state.moving_mean), float(ref_host.bn_state.moving_mean),
        atol=2e-4,
    )
    assert m  # silence unused warning if asserts above change


@pytest.mark.parametrize("mesh_shape", [(2, 4), (8, 1)])
def test_sharded_fused_adam_matches_single_chip(single_state, batch, mesh_shape):
    """Owner-side fused dense-Adam on the routed path vs the single-chip
    fused step (train/fused.py). Same comparison policy as the lazy test:
    Adam's mhat/sqrt(vhat) amplifies f32 reduction-order noise on
    near-zero grads into ~±lr flips, so evolved params are loose; the
    moments (linear/quadratic in the grads) are tight, and per-step
    loss/mse cover the full path — INCLUDING the L2 value, which the
    fused sharded step reports via psum'd per-shard sumsq."""
    from anime_recommendations_tpu.train.fused import fused_train_step

    users, anime, ratings, weights = batch
    mesh = make_mesh(*mesh_shape)
    step = ShardedTrainStep(
        mesh, l2_reg_factor=L2, routing="alltoall", optimizer="fused_adam"
    )
    sharded = place_state(clone_state(single_state), mesh, routing="alltoall")
    ref = clone_state(single_state)

    lr = jnp.float32(0.01)
    for i in range(3):
        sharded, s_loss, s_mse = step.train_step(
            sharded, users, anime, ratings, weights, lr
        )
        ref, r_loss, r_mse = fused_train_step(
            ref, users, anime, ratings, weights, lr, L2
        )
        np.testing.assert_allclose(
            float(s_loss), float(r_loss), rtol=1e-3, err_msg=f"step {i}"
        )
        np.testing.assert_allclose(float(s_mse), float(r_mse), rtol=1e-3)

    host = unstripe_state(sharded, mesh, "alltoall")
    ref_host = jax.tree.map(np.asarray, ref)
    np.testing.assert_allclose(
        host.opt_state.mu.user_emb, ref_host.opt_state.mu.user_emb,
        atol=1e-6, rtol=1e-4,
    )
    np.testing.assert_allclose(
        host.opt_state.mu.anime_emb, ref_host.opt_state.mu.anime_emb,
        atol=1e-6, rtol=1e-4,
    )
    np.testing.assert_allclose(
        host.params.user_emb, ref_host.params.user_emb, atol=2e-4
    )
    np.testing.assert_allclose(
        host.params.anime_emb, ref_host.params.anime_emb, atol=2e-4
    )
    # Dense semantics: UNTOUCHED rows still decay + update moments — they
    # must match the single-chip fused step, not the initial state.
    touched_u = np.unique(np.asarray(users))
    untouched = np.setdiff1d(np.arange(N_USERS), touched_u)
    if untouched.size:
        np.testing.assert_allclose(
            host.params.user_emb[untouched],
            ref_host.params.user_emb[untouched], atol=2e-4,
        )
        assert not np.allclose(
            host.params.user_emb[untouched],
            np.asarray(single_state.params.user_emb)[untouched],
        )


def test_sharded_fused_adam_exact_under_multi_round_overflow(single_state, batch):
    """Forcing a tiny capacity makes the exchange run MULTIPLE overflow
    rounds; route_grad_rows stages all receipts before ONE fused Adam
    application, so the result must be IDENTICAL to the generous-capacity
    single-round run — the semantic edge over lazy_adam's per-round
    deviation (routing.route_grads_lazy_adam docstring)."""
    users, anime, ratings, weights = batch
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    lr = jnp.float32(0.01)

    outs = []
    for cap in (None, 2):  # default (single-round) vs forced multi-round
        step = ShardedTrainStep(
            mesh, l2_reg_factor=L2, routing="alltoall",
            optimizer="fused_adam", capacity=cap,
        )
        st = place_state(clone_state(single_state), mesh, routing="alltoall")
        st, loss, mse = step.train_step(st, users, anime, ratings, weights, lr)
        outs.append((unstripe_state(st, mesh, "alltoall"), float(loss)))

    (a, la), (b, lb) = outs
    np.testing.assert_allclose(la, lb, rtol=1e-6)
    np.testing.assert_allclose(
        a.params.user_emb, b.params.user_emb, atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        a.opt_state.nu.anime_emb, b.opt_state.nu.anime_emb,
        atol=1e-7, rtol=1e-5,
    )


def test_pad_table():
    t = np.ones((10, 4), np.float32)
    out = pad_table(t, 4)
    assert out.shape == (12, 4)
    np.testing.assert_array_equal(out[10:], 0.0)
    assert pad_table(t, 5).shape == (10, 4)


@pytest.mark.parametrize("routing", ["psum", "alltoall"])
def test_training_converges_on_mesh(routing):
    """A few sharded steps reduce the loss on a learnable problem."""
    rng = np.random.default_rng(0)
    U = rng.normal(size=(N_USERS, 4))
    V = rng.normal(size=(N_ANIME, 4))
    users = rng.integers(0, N_USERS, 4096)
    anime = rng.integers(0, N_ANIME, 4096)
    y = (1 / (1 + np.exp(-np.einsum("ij,ij->i", U[users], V[anime])))).astype(np.float32)

    mesh = make_mesh(4, 2)
    step = ShardedTrainStep(mesh, l2_reg_factor=1e-6, routing=routing)
    state = place_state(
        init_train_state(jax.random.PRNGKey(1), N_USERS, N_ANIME, 16),
        mesh, routing=routing,
    )
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


def test_zero_weight_padded_batch_is_inert(single_state, batch):
    """pad_batch_for_hosts semantics: a global batch zero-weight-padded to
    a shard multiple must produce the SAME loss and the same updated state
    as the unpadded batch — the ragged-tail story for multi-host feeding
    (distributed.host_batch_slice docstring)."""
    from anime_recommendations_tpu.parallel.distributed import (
        pad_batch_for_hosts,
    )

    users, anime, ratings, weights = batch
    mesh = make_mesh(2, 2, devices=jax.devices()[:4])
    step = ShardedTrainStep(
        mesh, l2_reg_factor=L2, routing="alltoall", optimizer="fused_adam"
    )
    lr = jnp.float32(0.01)

    # Ragged: drop the last 3 rows, then pad back to a multiple of 4.
    b = users.shape[0] - 3
    pu, pa, pr, pw = pad_batch_for_hosts(
        np.asarray(users)[:b], np.asarray(anime)[:b],
        np.asarray(ratings)[:b], n_shards=4,
    )
    assert len(pu) % 4 == 0 and (pw[b:] == 0).all()

    st1 = place_state(clone_state(single_state), mesh, routing="alltoall")
    st1, l1, m1 = step.train_step(
        st1, jnp.asarray(pu), jnp.asarray(pa), jnp.asarray(pr),
        jnp.asarray(pw), lr,
    )
    # Oracle: the same ragged batch padded with a DIFFERENT inert filler
    # (repeat row 0 at weight 0) — results must agree exactly.
    qu, qa, qr, qw = pu.copy(), pa.copy(), pr.copy(), pw.copy()
    qu[b:], qa[b:], qr[b:] = users[0], anime[0], ratings[0]
    st2 = place_state(clone_state(single_state), mesh, routing="alltoall")
    st2, l2_, m2 = step.train_step(
        st2, jnp.asarray(qu), jnp.asarray(qa), jnp.asarray(qr),
        jnp.asarray(qw), lr,
    )
    np.testing.assert_allclose(float(l1), float(l2_), rtol=1e-6)
    np.testing.assert_allclose(float(m1), float(m2), rtol=1e-6)
    h1 = unstripe_state(st1, mesh, "alltoall")
    h2 = unstripe_state(st2, mesh, "alltoall")
    np.testing.assert_allclose(
        h1.params.user_emb, h2.params.user_emb, atol=1e-6
    )
    np.testing.assert_allclose(
        h1.opt_state.nu.anime_emb, h2.opt_state.nu.anime_emb, atol=1e-7
    )
