"""LazyAdam training step: row-sparse Adam for the embedding tables.

The exact-parity path (train/trainer.py, device_loop.py) reproduces Keras
semantics: the full-table L2 regularizer makes every gradient dense, so each
step streams read+write over W, mu, nu of BOTH tables (~330 MB at reference
shapes) — the measured HBM-bandwidth wall (NOTES_PERF.md).

This module implements the standard production-recommender alternative
(TensorFlow Addons LazyAdam / PyTorch SparseAdam): Adam moments, weight
updates, and L2 decay are applied ONLY to rows touched by the batch.
Per-step table traffic drops to ~6 gathered/scattered row-batches
(~35 MB at batch 10k), independent of table size.

Semantic differences vs the dense path (all inherent to lazy updates, not
implementation shortcuts):
  * untouched rows keep stale Adam moments (no decay while unseen);
  * L2 decay applies per-touch instead of per-step, so effective
    regularization scales with row frequency;
  * the loss reported by the step is the data loss only (the L2 term's
    VALUE would itself cost a full-table pass). History `loss` for lazy
    runs therefore excludes the L2 term while `val_loss` (computed by the
    full eval path) includes it — the two columns are not directly
    comparable to each other, only to their dense-run counterparts.

Duplicate in-batch rows are handled exactly: the batch is sorted by row id,
per-unique-row gradient sums are computed with a segment-sum, and one Adam
update per unique row is scatter-ADDED as a delta (duplicates contribute
zero), which keeps the scatter deterministic.

First step from a fresh state with l2=0 matches dense Adam bit-for-bit on
touched rows (tests/test_lazy_adam.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from anime_recommendations_tpu.models.two_tower import (
    BNState,
    TwoTowerParams,
    bce,
    cosine_merge,
    head,
)
from anime_recommendations_tpu.train.trainer import KERAS_ADAM_EPS, TrainState

B1, B2 = 0.9, 0.999


class _RowUpdate(NamedTuple):
    w: jax.Array
    mu: jax.Array
    nu: jax.Array


def lazy_row_adam(
    w: jax.Array,        # [N, D]
    mu: jax.Array,       # [N, D]
    nu: jax.Array,       # [N, D]
    ids: jax.Array,      # [B] i32 touched row per example
    g_rows: jax.Array,   # [B, D] grad w.r.t. the gathered rows
    t: jax.Array,        # [] Adam step count AFTER this update
    lr: jax.Array,
    l2: float,
    b1: float = B1,
    b2: float = B2,
    eps: float = KERAS_ADAM_EPS,
) -> _RowUpdate:
    """One lazy-Adam table update. Touches only rows in ``ids``."""
    b = ids.shape[0]
    order = jnp.argsort(ids, stable=False)  # grouping only; sums are order-free
    ids_s = ids[order].astype(jnp.int32)
    g_s = g_rows[order]

    # Segment machinery over duplicate ids (sorted -> contiguous runs).
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    )
    seg = jnp.cumsum(is_start) - 1                         # [B] run index
    g_seg = jax.ops.segment_sum(g_s, seg, num_segments=b)  # per-run grad sum
    start_f = is_start[:, None].astype(g_s.dtype)
    g_tot = g_seg[seg] * start_f                           # sum at run head, 0 elsewhere

    w_rows = w[ids_s]
    mu_rows = mu[ids_s]
    nu_rows = nu[ids_s]
    g_tot = g_tot + (2.0 * l2) * w_rows * start_f          # decay once per run

    tf32 = t.astype(jnp.float32)
    bc1 = 1.0 - jnp.float32(b1) ** tf32
    bc2 = 1.0 - jnp.float32(b2) ** tf32
    mu_new = b1 * mu_rows + (1.0 - b1) * g_tot
    nu_new = b2 * nu_rows + (1.0 - b2) * (g_tot * g_tot)
    upd = -lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)

    # Scatter ONE updated row per unique id: the non-head duplicate at
    # position i is routed to the out-of-bounds index n+i and dropped. n+i
    # is distinct per duplicate AND distinct from every in-bounds head, so
    # unique_indices=True is genuinely honored (JAX documents UB when the
    # uniqueness promise is violated, even with mode='drop'). The index
    # stream is no longer globally sorted (OOB values interleave with
    # heads), so the sorted claim is dropped.
    n = w.shape[0]
    idx = jnp.where(is_start, ids_s, n + jnp.arange(b, dtype=ids_s.dtype))
    kw = dict(unique_indices=True, mode="drop")
    return _RowUpdate(
        w=w.at[idx].set(w_rows + upd, **kw),
        mu=mu.at[idx].set(mu_new, **kw),
        nu=nu.at[idx].set(nu_new, **kw),
    )


def _scalar_adam(p, mu, nu, g, bc1, bc2, lr, eps=KERAS_ADAM_EPS):
    mu_new = B1 * mu + (1.0 - B1) * g
    nu_new = B2 * nu + (1.0 - B2) * (g * g)
    p_new = p - lr * (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
    return p_new, mu_new, nu_new


def _data_loss(u_rows, a_rows, head_params, bn_state, ratings, weights):
    dense_w, dense_b, bn_gamma, bn_beta = head_params
    proxy = TwoTowerParams(
        user_emb=u_rows, anime_emb=a_rows,   # unused by head()
        dense_w=dense_w, dense_b=dense_b,
        bn_gamma=bn_gamma, bn_beta=bn_beta,
    )
    cos = cosine_merge(u_rows, a_rows)
    pred, new_bn = head(proxy, cos, bn_state, train=True, weights=weights)
    denom = jnp.maximum(jnp.sum(weights), 1.0)
    loss = jnp.sum(bce(pred, ratings) * weights) / denom
    mse = jnp.sum(jnp.square(pred - ratings) * weights) / denom
    return loss, (mse, new_bn)


@partial(jax.jit, donate_argnums=0, static_argnames=("l2_reg_factor",))
def lazy_train_step(
    state: TrainState,
    users: jax.Array,
    anime: jax.Array,
    ratings: jax.Array,
    weights: jax.Array,
    lr: jax.Array,
    l2_reg_factor: float,
) -> tuple[TrainState, jax.Array, jax.Array]:
    """One lazy-Adam step. Returns (new_state, batch_data_loss, batch_mse).

    Gradients are taken w.r.t. the GATHERED rows (so no dense table
    gradient ever exists); tables update via lazy_row_adam, the 4 scalar
    head parameters via ordinary (dense) Adam with the shared step count.
    """
    params = state.params
    opt: optax.ScaleByAdamState = state.opt_state
    u_rows = params.user_emb[users]
    a_rows = params.anime_emb[anime]
    head_params = (params.dense_w, params.dense_b,
                   params.bn_gamma, params.bn_beta)

    (loss, (mse, new_bn)), (d_u, d_a, d_head) = jax.value_and_grad(
        _data_loss, argnums=(0, 1, 2), has_aux=True
    )(u_rows, a_rows, head_params, state.bn_state, ratings, weights)

    t = opt.count + 1
    up_u = lazy_row_adam(
        params.user_emb, opt.mu.user_emb, opt.nu.user_emb,
        users, d_u, t, lr, l2_reg_factor,
    )
    up_a = lazy_row_adam(
        params.anime_emb, opt.mu.anime_emb, opt.nu.anime_emb,
        anime, d_a, t, lr, l2_reg_factor,
    )

    tf32 = t.astype(jnp.float32)
    bc1 = 1.0 - jnp.float32(B1) ** tf32
    bc2 = 1.0 - jnp.float32(B2) ** tf32
    names = ("dense_w", "dense_b", "bn_gamma", "bn_beta")
    new_scalars, new_mu_s, new_nu_s = {}, {}, {}
    for name, g in zip(names, d_head):
        p, m, v = _scalar_adam(
            getattr(params, name), getattr(opt.mu, name),
            getattr(opt.nu, name), g, bc1, bc2, lr,
        )
        new_scalars[name], new_mu_s[name], new_nu_s[name] = p, m, v

    new_params = TwoTowerParams(
        user_emb=up_u.w, anime_emb=up_a.w, **new_scalars
    )
    new_opt = optax.ScaleByAdamState(
        count=t,
        mu=TwoTowerParams(user_emb=up_u.mu, anime_emb=up_a.mu, **new_mu_s),
        nu=TwoTowerParams(user_emb=up_u.nu, anime_emb=up_a.nu, **new_nu_s),
    )
    return TrainState(new_params, new_bn, new_opt), loss, mse
