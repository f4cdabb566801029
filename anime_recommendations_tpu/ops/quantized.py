"""Two-stage int8 retrieval: quantized scan + exact f32 rescore.

The retrieval scan (ops/topk.py) is DMA-bound — it reads the whole
embedding table once per query batch. Storing the table in int8 cuts that
read 4x vs f32 (2x vs bf16). int8 dot products carry ~1/127-per-element
noise, so stage 1 over-selects a candidate pool of ``m >> k`` rows with the
quantized kernel and stage 2 rescores just those m rows in exact f32 and
takes the true top-k. With m >= 4k the pool virtually always contains the
exact top-k (tests assert exact oracle overlap on random tables; bench
tracks it on every run).

Quantization: symmetric per-row int8 over L2-NORMALIZED rows —
``q_r = round(127 * w_r / max|w_r|)``, ``scale_r = max|w_r| / 127``.
cos(q, r) ≈ (iq · ir) * scale_q * scale_r, applied as a row-scale inside
the kernel before masking/extraction.

Stage 1 reuses the masked_topk kernel structure with an int8 MXU matmul
(preferred_element_type=int32) and a fused per-row de-scale; masks,
self-exclusion and the optional sigmoid head behave identically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anime_recommendations_tpu.ops.topk import (
    _NEG,
    _round_up,
    GROUP,
    IDX_BITS,
    _INT_MIN,
    _float_key,
    key_threshold,
)

DEFAULT_BLOCK_ROWS = 4096   # int8 rows are 4x smaller; same ~0.5 MB/block


class QuantizedTable(NamedTuple):
    """int8 rows + per-row de-scale factors + the f32 original for rescore."""

    q: jax.Array        # [N, D] int8
    scale: jax.Array    # [N] f32 (q * scale ~= original row)
    f32: jax.Array      # [N, D] float32 (or bf16) exact rows


def quantize_rows(table: jax.Array) -> QuantizedTable:
    """Symmetric per-row int8 quantization (keep the original for rescore)."""
    absmax = jnp.maximum(jnp.max(jnp.abs(table), axis=1), 1e-12)
    scale = (absmax / 127.0).astype(jnp.float32)
    q = jnp.round(table / scale[:, None]).astype(jnp.int8)
    return QuantizedTable(q=q, scale=scale, f32=table)


# GROUP/IDX_BITS/_float_key/key_threshold live in ops/topk.py (shared with
# the float two-stage path, which adopted this kernel's extraction scheme).


def _int8_topk_kernel(
    q_ref,        # [Qp, D] int8 queries
    qscale_ref,   # [1, Qp] f32 per-query de-scale
    w_ref,        # [B, D] int8 table block
    wscale_ref,   # [1, B] f32 per-row de-scale
    mask_ref,     # [1, B] f32 row-validity (>0 keeps)
    excl_ref,     # [1, Qp] i32 per-query excluded row (-1: none)
    head_ref,     # [1, 2] f32 (alpha, beta) sigmoid head, SMEM
    out_s_ref,    # [r_pad, Qp] int32 packed keys (order == score order)
    out_i_ref,    # [r_pad, Qp] int32 global row indices
    *,
    top_r: int,
    r_pad: int,
    block_rows: int,
    n_valid: int,
    use_head: bool,
):
    """Grouped packed-max extraction: per GROUP-lane group, the top_r best
    rows via single int32 max passes (score bits packed with the lane index,
    so max IS argmax). ~top_r*2 VPU passes per block instead of the exact
    kernel's 3*k — the pool is approximate by design and rescored exactly
    in stage 2."""
    b = pl.program_id(0)
    base = b * block_rows
    group = min(GROUP, block_rows)
    n_groups = block_rows // group

    acc = jax.lax.dot_general(
        q_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [Qp, B] exact int32
    scores = (
        acc.astype(jnp.float32)
        * qscale_ref[0, :][:, None]
        * wscale_ref[0, :][None, :]
    )
    if use_head:
        scores = jax.nn.sigmoid(head_ref[0, 0] * scores + head_ref[0, 1])

    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    valid = rows < n_valid
    valid &= mask_ref[0, :][None, :] > 0.0
    valid &= rows != excl_ref[0, :][:, None]
    scores = jnp.where(valid, scores, _NEG)

    key = _float_key(scores)                       # [Qp, B] monotonic ints
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) % group
    packed = (key & jnp.int32(~((1 << IDX_BITS) - 1))) | lane

    qp = scores.shape[0]
    for g in range(n_groups):
        sub = packed[:, g * group:(g + 1) * group]
        for j in range(top_r):
            best = jnp.max(sub, axis=1)            # max IS argmax (packed)
            out_s_ref[g * top_r + j, :] = best
            out_i_ref[g * top_r + j, :] = (
                base + g * group + (best & jnp.int32((1 << IDX_BITS) - 1))
            )
            sub = jnp.where(sub == best[:, None], jnp.int32(_INT_MIN), sub)
    for j in range(n_groups * top_r, r_pad):
        out_s_ref[j, :] = jnp.full((qp,), _INT_MIN, jnp.int32)
        out_i_ref[j, :] = jnp.full((qp,), -1, jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("m", "block_rows", "interpret", "use_head", "lane_pad")
)
def _quantized_candidates(
    qt_q, qt_scale, queries, m, mask=None, exclude=None, head=None,
    block_rows=DEFAULT_BLOCK_ROWS, interpret=None, use_head=False, lane_pad=8,
):
    """Stage 1: top-m candidate row indices per query from the int8 scan."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = qt_q.shape
    qn = queries.shape[0]
    block_rows = min(block_rows, _round_up(n, 32))
    while block_rows > 512 and block_rows * d > 2 * 1024 * 1024:
        block_rows //= 2
    # The grouped extraction scans n_groups * GROUP rows per block; a block
    # not a multiple of GROUP would leave a tail of rows that are matmul'd
    # but never extraction candidates (silently dropping true top-k rows in
    # the tail). Round DOWN to a GROUP multiple (never up: the VMEM clamp
    # above must hold); blocks <= GROUP are one full group by construction.
    if block_rows > GROUP:
        block_rows -= block_rows % GROUP

    # Quantize the queries with their own per-row scales.
    q_abs = jnp.maximum(jnp.max(jnp.abs(queries), axis=1), 1e-12)
    q_scale = (q_abs / 127.0).astype(jnp.float32)
    q_int = jnp.round(queries / q_scale[:, None]).astype(jnp.int8)

    # int8 arrays tile at (32, 128): the query block's sublane dim must be
    # a multiple of 32.
    qp = _round_up(max(qn, 1), max(lane_pad, 32))
    # The table/scales are NOT padded: the ragged trailing block reads
    # undefined rows, which the kernel kills via rows < n_valid (padding
    # would jnp.pad-COPY the whole table in HBM per call — see ops/topk.py).
    nb = -(-n // block_rows)
    # Per-group depth: 3 covers m=4k pools with overwhelming probability
    # (a true-top-k miss needs >top_r of the k winners in ONE 512-row
    # group); deepen with m when the caller asks for a large pool.
    group = min(GROUP, block_rows)
    n_groups = block_rows // group
    top_r = max(3, -(-m // max(nb * n_groups, 1)) + 1)
    r_pad = _round_up(n_groups * top_r, 8)

    q_p = jnp.pad(q_int, ((0, qp - qn), (0, 0)))
    qs_p = jnp.pad(q_scale.reshape(1, qn), ((0, 0), (0, qp - qn)))
    ws_row = qt_scale.reshape(1, n)
    if mask is None:
        mask_row = jnp.ones((1, n), jnp.float32)
    else:
        mask_row = mask.astype(jnp.float32).reshape(1, n)
    if exclude is None:
        excl_row = jnp.full((1, qp), -1, jnp.int32)
    else:
        excl_row = jnp.pad(
            exclude.astype(jnp.int32).reshape(1, qn), ((0, 0), (0, qp - qn)),
            constant_values=-1,
        )
    head_arr = (jnp.zeros((1, 2), jnp.float32) if head is None
                else head.astype(jnp.float32).reshape(1, 2))

    kernel = functools.partial(
        _int8_topk_kernel, top_r=top_r, r_pad=r_pad, block_rows=block_rows,
        n_valid=n, use_head=use_head,
    )
    block_s, block_i = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((r_pad, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * r_pad, qp), jnp.int32),
            jax.ShapeDtypeStruct((nb * r_pad, qp), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(q_p, qs_p, qt_q, ws_row, mask_row, excl_row, head_arr)

    cand_s = block_s.T        # packed int32 keys; int order == score order
    cand_i = block_i.T
    m_eff = min(m, cand_s.shape[1])
    top_s, pos = jax.lax.top_k(cand_s, m_eff)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


@functools.partial(
    jax.jit,
    static_argnames=("k", "m", "block_rows", "interpret", "use_head", "lane_pad"),
)
def quantized_topk(
    qt: QuantizedTable,
    queries: jax.Array,        # [Qn, D] float
    k: int,
    m: int | None = None,      # candidate pool size (default 4k, >= k)
    mask: jax.Array | None = None,
    exclude: jax.Array | None = None,
    head: jax.Array | None = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
    use_head: bool = False,
    lane_pad: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Exact-rescored top-k via an int8 scan. Same contract as masked_topk.

    Stage 1 scans the int8 table for m candidates; stage 2 gathers the m
    f32 rows, rescoring them exactly, and returns the top-k of the pool.
    """
    if queries.ndim == 1:
        queries = queries[None, :]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qn = queries.shape[0]
    n = qt.q.shape[0]
    # Tiny tables: the dense path is faster than any staging and dodges
    # single-block Mosaic compiles (see ops/topk.py small-table note).
    if n <= 4096 and not interpret:
        from anime_recommendations_tpu.ops.topk import masked_topk

        return masked_topk(
            qt.f32, queries, k, mask=mask, exclude=exclude, head=head,
            use_head=use_head, lane_pad=lane_pad,
        )
    if m is None:
        m = min(max(4 * k, k + 8), n)
    m = max(m, k)
    cand_vals, cand = _quantized_candidates(
        qt.q, qt.scale, queries, m, mask=mask, exclude=exclude, head=head,
        block_rows=block_rows, interpret=interpret, use_head=use_head,
        lane_pad=lane_pad,
    )  # [Qn, m] candidate rows (may contain -1 when < m valid rows exist)

    # Stage 2: exact f32 rescore of the candidate pool. A stage-1 key at
    # the sentinel means the candidate slot is exhausted/masked padding —
    # it must stay dead, not rescored. Keys are packed ints; compare
    # against the packed form of the float sentinel.
    alive = (cand >= 0) & (cand_vals > key_threshold(_NEG / 2))
    safe = jnp.clip(cand, 0, n - 1)
    rows = qt.f32[safe].astype(jnp.float32)               # [Qn, m, D]
    scores = jnp.einsum(
        "qd,qmd->qm", queries.astype(jnp.float32), rows,
        precision=jax.lax.Precision.HIGHEST,
    )
    if use_head:
        scores = jax.nn.sigmoid(head[0] * scores + head[1])
    scores = jnp.where(alive, scores, _NEG)
    cand = jnp.where(alive, cand, -1)
    top_s, pos = jax.lax.top_k(scores, k)
    top_i = jnp.take_along_axis(cand, pos, axis=1)
    return top_s, top_i
