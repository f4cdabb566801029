"""SPMD training step: row-sharded embedding tables over a 2-axis mesh.

TPU-native replacement for the reference's data-parallel-only
TPUStrategy training (neural_network.py:142-178). Layout (SURVEY.md §2
parallelism table, BASELINE.json north star):

  * batch           : split over 'data'
  * user table      : row-sharded over 'model' (the ~350K-row scaling axis)
  * anime table     : replicated by default (18K x 128 f32 ~ 9 MB),
                      optionally row-sharded over 'model'
  * head + BN       : replicated

Embedding lookup routing: every device gathers the rows it OWNS for its
batch shard (masked local gather) and an ICI all-reduce over 'model'
(psum of the [B_local, D] gathered block) assembles full rows — HBM
traffic stays local to the owning shard; comm per step is B_local x D
floats, independent of table size. The gather's transpose (scatter-add of
row gradients) lands only on the owning shard by the same mask.

Gradient reduction: grads of replicated leaves (anime table, head) and of
the model-sharded user block are psum'd over 'data'. The Keras-style L2
term (full-table) is added analytically as 2*lambda*W AFTER the data
reduction — exact, and it keeps per-shard autodiff free of cross-shard
regularizer terms.

BatchNorm uses GLOBAL batch statistics (psum over 'data'), so the
multi-chip step is bit-compatible with the single-chip math — a deliberate
deviation from TF's per-replica default, recorded in SURVEY.md hard
part (d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from anime_recommendations_tpu.models.two_tower import (
    KERAS_BN_EPS,
    KERAS_BN_MOMENTUM,
    BNState,
    TwoTowerParams,
    bce,
    cosine_merge,
)
from anime_recommendations_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from anime_recommendations_tpu.train.trainer import TrainState, make_optimizer


def param_specs(shard_anime: bool = False) -> TwoTowerParams:
    """PartitionSpecs for each model leaf."""
    return TwoTowerParams(
        user_emb=P(MODEL_AXIS, None),
        anime_emb=P(MODEL_AXIS, None) if shard_anime else P(),
        dense_w=P(),
        dense_b=P(),
        bn_gamma=P(),
        bn_beta=P(),
    )


def state_specs(shard_anime: bool = False) -> TrainState:
    p = param_specs(shard_anime)
    bn = BNState(moving_mean=P(), moving_var=P())
    opt = optax.ScaleByAdamState(count=P(), mu=p, nu=p)
    return TrainState(params=p, bn_state=bn, opt_state=opt)


def state_shardings(mesh, shard_anime: bool = False) -> TrainState:
    return jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        state_specs(shard_anime),
        is_leaf=lambda x: isinstance(x, P),
    )


def place_state(state: TrainState, mesh, shard_anime: bool = False) -> TrainState:
    """device_put a (host or single-device) TrainState onto the mesh."""
    return jax.device_put(state, state_shardings(mesh, shard_anime))


def _sharded_lookup(table_local: jax.Array, idx: jax.Array, axis: str) -> jax.Array:
    """Gather rows of a row-sharded table: masked local gather + psum(axis)."""
    rows_local = table_local.shape[0]
    shard = jax.lax.axis_index(axis)
    local = idx - shard * rows_local
    owned = (local >= 0) & (local < rows_local)
    safe = jnp.clip(local, 0, rows_local - 1)
    gathered = table_local[safe] * owned[:, None].astype(table_local.dtype)
    return jax.lax.psum(gathered, axis)


def _global_weighted_moments(z, w):
    """Weighted batch mean/var across the full global batch (psum 'data')."""
    denom = jax.lax.psum(jnp.sum(w), DATA_AXIS)
    denom = jnp.maximum(denom, 1.0)
    mean = jax.lax.psum(jnp.sum(z * w), DATA_AXIS) / denom
    var = jax.lax.psum(jnp.sum(jnp.square(z - mean) * w), DATA_AXIS) / denom
    return mean, var, denom


class ShardedTrainStep:
    """Compiled SPMD train/eval steps over a ('data','model') mesh."""

    def __init__(
        self,
        mesh,
        l2_reg_factor: float = 1e-4,
        shard_anime: bool = False,
    ):
        self.mesh = mesh
        self.l2 = float(l2_reg_factor)
        self.shard_anime = shard_anime
        self._train = self._build_train()
        self._eval = self._build_eval()
        self._grads = self._build_grads()

    # ---- public API -----------------------------------------------------------

    def train_step(self, state, users, anime, ratings, weights, lr):
        return self._train(state, users, anime, ratings, weights, lr)

    def eval_sums(self, params, bn_state, users, anime, ratings, weights):
        """Returns (loss_sum, mse_sum, weight_sum) over the global batch."""
        return self._eval(params, bn_state, users, anime, ratings, weights)

    def grads(self, state, users, anime, ratings, weights):
        """Debug/verification entry: the exact global gradient pytree
        (data-psum'd + analytic L2), before any optimizer transform."""
        return self._grads(state, users, anime, ratings, weights)

    # ---- construction ---------------------------------------------------------

    def _forward_local(self, params, users, anime, weights, bn_stats):
        """Per-shard forward to predictions; bn_stats None -> use batch stats."""
        u_rows = _sharded_lookup(params.user_emb, users, MODEL_AXIS)
        if self.shard_anime:
            a_rows = _sharded_lookup(params.anime_emb, anime, MODEL_AXIS)
        else:
            a_rows = params.anime_emb[anime]
        cos = cosine_merge(u_rows, a_rows)
        z = params.dense_w * cos + params.dense_b
        if bn_stats is None:
            mean, var, _ = _global_weighted_moments(z, weights)
        else:
            mean, var = bn_stats
        z_hat = (z - mean) * jax.lax.rsqrt(var + KERAS_BN_EPS)
        pred = jax.nn.sigmoid(params.bn_gamma * z_hat + params.bn_beta)
        return pred, (mean, var)

    def _data_loss_and_metrics(self, params, users, anime, ratings, weights,
                               bn_stats):
        pred, stats = self._forward_local(params, users, anime, weights, bn_stats)
        denom = jnp.maximum(jax.lax.psum(jnp.sum(weights), DATA_AXIS), 1.0)
        loss = jax.lax.psum(jnp.sum(bce(pred, ratings) * weights), DATA_AXIS) / denom
        mse = jax.lax.psum(
            jnp.sum(jnp.square(pred - ratings) * weights), DATA_AXIS
        ) / denom
        return loss, (mse, stats)

    def _reg_sum(self, params):
        user_sq = jax.lax.psum(jnp.sum(jnp.square(params.user_emb)), MODEL_AXIS)
        anime_sq = jnp.sum(jnp.square(params.anime_emb))
        if self.shard_anime:
            anime_sq = jax.lax.psum(anime_sq, MODEL_AXIS)
        return self.l2 * (user_sq + anime_sq)

    def _build_train(self):
        specs = state_specs(self.shard_anime)
        batch_spec = P(DATA_AXIS)

        def step(state: TrainState, users, anime, ratings, weights, lr):
            def loss_fn(params):
                loss, aux = self._data_loss_and_metrics(
                    params, users, anime, ratings, weights, None
                )
                return loss, aux

            (data_loss, (mse, (mean, var))), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)

            # The vma-aware shard_map transpose already reduces grads of
            # replicated/model-sharded leaves over 'data' (the loss is
            # psum'd there); only the analytic L2 term is added here.
            grads = grads._replace(
                user_emb=grads.user_emb + 2.0 * self.l2 * state.params.user_emb,
                anime_emb=grads.anime_emb + 2.0 * self.l2 * state.params.anime_emb,
            )

            updates, new_opt = make_optimizer().update(
                grads, state.opt_state, state.params
            )
            updates = jax.tree.map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(state.params, updates)

            new_bn = BNState(
                moving_mean=state.bn_state.moving_mean * KERAS_BN_MOMENTUM
                + mean * (1.0 - KERAS_BN_MOMENTUM),
                moving_var=state.bn_state.moving_var * KERAS_BN_MOMENTUM
                + var * (1.0 - KERAS_BN_MOMENTUM),
            )
            loss = data_loss + self._reg_sum(state.params)
            return TrainState(new_params, new_bn, new_opt), loss, mse

        mapped = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(specs, batch_spec, batch_spec, batch_spec, batch_spec, P()),
            out_specs=(specs, P(), P()),
        )
        self._train_mapped = mapped  # unjitted, for nesting inside lax.scan
        return jax.jit(mapped, donate_argnums=0)

    def _build_grads(self):
        specs = state_specs(self.shard_anime)
        batch_spec = P(DATA_AXIS)

        def step(state: TrainState, users, anime, ratings, weights):
            def loss_fn(params):
                loss, aux = self._data_loss_and_metrics(
                    params, users, anime, ratings, weights, None
                )
                return loss, aux

            _, grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return grads._replace(
                user_emb=grads.user_emb + 2.0 * self.l2 * state.params.user_emb,
                anime_emb=grads.anime_emb + 2.0 * self.l2 * state.params.anime_emb,
            )

        mapped = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(specs, batch_spec, batch_spec, batch_spec, batch_spec),
            out_specs=specs.params,
        )
        return jax.jit(mapped)

    def _build_eval(self):
        specs = state_specs(self.shard_anime)
        batch_spec = P(DATA_AXIS)

        def step(params, bn, users, anime, ratings, weights):
            pred, _ = self._forward_local(
                params, users, anime, weights,
                (bn.moving_mean, bn.moving_var),
            )
            w_sum = jax.lax.psum(jnp.sum(weights), DATA_AXIS)
            loss_sum = jax.lax.psum(jnp.sum(bce(pred, ratings) * weights), DATA_AXIS)
            mse_sum = jax.lax.psum(
                jnp.sum(jnp.square(pred - ratings) * weights), DATA_AXIS
            )
            loss_sum = loss_sum + self._reg_sum(params) * w_sum
            return loss_sum, mse_sum, w_sum

        mapped = jax.shard_map(
            step,
            mesh=self.mesh,
            in_specs=(specs.params, specs.bn_state, batch_spec, batch_spec,
                      batch_spec, batch_spec),
            out_specs=(P(), P(), P()),
        )
        return jax.jit(mapped)

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(DATA_AXIS))


def build_epoch_fn(step: ShardedTrainStep, shuffle: bool):
    """Device-resident SPMD epoch: lax.scan over the shard_map train step.

    The multi-chip analog of train/device_loop.train_epoch — one launch per
    epoch instead of one per batch. Batch arrays are [nb, B] with B sharded
    over 'data' (so lax.scan slices batches without resharding). Per-epoch
    shuffling permutes BATCH ORDER (batch composition is fixed by the
    staging host-shuffle; re-mixing examples across sharded batches each
    epoch would need cross-shard all-to-alls — a deliberate trade, see
    ShardedTrainer._stage_device).
    """
    import functools

    mapped = step._train_mapped

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch(state, users, anime, ratings, weights, key, lr):
        xs = (users, anime, ratings, weights)
        if shuffle:
            perm = jax.random.permutation(key, users.shape[0])
            xs = tuple(x[perm] for x in xs)

        def body(state, batch):
            u, a, r, w = batch
            new_state, loss, mse = mapped(state, u, a, r, w, lr)
            return new_state, (loss, mse, jnp.sum(w))

        state, (losses, mses, wsums) = jax.lax.scan(body, state, xs)
        return state, losses, mses, wsums

    return epoch
