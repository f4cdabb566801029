"""Pallas kernel: fused similarity matmul + masked top-k.

TPU-native replacement for the reference retrieval hot loop
(similar_anime.py:404-408, similar_users.py:293-296): instead of
materializing all N scores in HBM and argsort-ing them on the host, each
grid step streams one row-block of the embedding table through VMEM,
computes the block's scores on the MXU, applies validity masks, and reduces
to a per-block candidate set on the VPU.

Production path (two-stage, mirrors ops/quantized.py):
  stage 1 — DEFAULT-precision matmul (single MXU pass even for f32 inputs)
            + grouped packed-max extraction: per 512-lane group the top_r
            best rows fall out of single int32 max passes (score bits
            packed with the lane index, so max IS argmax);
  stage 2 — the ~max(4k, 64) pooled candidates are gathered and rescored
            in exact f32 (HIGHEST), and the true top-k of the pool returned.
Measured on one TPU v5e chip, 350K x 128 f32, q=8, k=10: 0.238 ms vs the
0.219 ms one-table-read DMA floor (the single-stage HIGHEST-precision
kernel costs 1.076 ms — its 3-pass f32 matmul plus full-width extraction
dominate; NOTES_PERF.md round-3 section has the variant table).

``exact_scan=True`` keeps the adversarially-exact single-stage kernel
(HIGHEST-precision scan, running-threshold block skip): stage 1's truncated
keys (9 mantissa bits carry the lane index) could in principle demote a
true top-k row past the pool boundary when >m-k rows tie within ~2^-9
relative score — impossible to hit with real embedding geometry, but the
escape hatch preserves a worst-case-exact mode.

HBM traffic is one read of the table (plus tiny outputs) — the
speed-of-light bound for this op. Filters (type/genre restriction,
self-exclusion, watched-set masking) are pushed INTO the kernel as masks,
replacing the reference's post-hoc pandas row loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # masked-score sentinel (finite: avoids inf-inf NaNs)
DEFAULT_BLOCK_ROWS = 2048

GROUP = 512          # lanes per packed-extraction group
IDX_BITS = 9         # log2(GROUP): index packed into the key's low bits
_INT_MIN = -(2 ** 31)  # int32 min as a python int (jnp constants get captured)


def _float_key(scores: jax.Array) -> jax.Array:
    """Order-preserving f32 -> int32 map (negatives un-reversed)."""
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    return jnp.where(bits >= 0, bits, jnp.int32(_INT_MIN) - bits)


def key_threshold(x: float) -> int:
    """Host-side _float_key for liveness thresholds."""
    import numpy as np

    bits = int(np.float32(x).view(np.int32))
    return bits if bits >= 0 else -(2 ** 31) - bits


def _topk_kernel(
    q_ref,       # [Qp, D] queries, VMEM
    w_ref,       # [B, D] table block, VMEM
    mask_ref,    # [1, B] f32 row-validity (>0 keeps), VMEM
    excl_ref,    # [1, Qp] i32 row to exclude per query (-1: none), VMEM
    qlive_ref,   # [1, Qp] f32 1 for real queries, 0 for lane padding, VMEM
    head_ref,    # [1, 2] f32 (alpha, beta) for the optional sigmoid head, SMEM
    out_s_ref,   # [k_pad, Qp] block top-k scores
    out_i_ref,   # [k_pad, Qp] block top-k row indices
    thresh_ref,  # [8, Qp] f32 scratch: row 0 = per-query running k-th best
    *,
    k: int,
    k_pad: int,
    block_rows: int,
    n_valid: int,
    use_head: bool,
):
    b = pl.program_id(0)
    base = b * block_rows

    # Running-threshold init: a block can only contribute to a query's
    # global top-k if some row beats the k-th best of an already-extracted
    # block (tau). Padded query lanes get +inf so they never force an
    # extraction. Scratch persists across the sequential grid.
    @pl.when(b == 0)
    def _():
        thresh_ref[:, :] = jnp.where(
            qlive_ref[0, :][None, :] > 0.0, _NEG, -_NEG
        ) * jnp.ones((thresh_ref.shape[0], 1), jnp.float32)
    # MXU: [Qp, D] x [B, D]^T -> [Qp, B], f32 accumulate. The [Qp, B]
    # layout is load-bearing: table rows land on the LANE axis, so the
    # VPU extraction below runs at full 8x128 occupancy even for small
    # query counts (a [B, Qp<128] layout would idle most lanes). For f32
    # tables use HIGHEST precision (3-pass bf16) — the kernel is
    # HBM-bound, not MXU-bound, and retrieval order should match the f32
    # oracle. bf16 tables use the native single-pass (Mosaic rejects fp32
    # contract precision on bf16 operands).
    f32_inputs = w_ref.dtype == jnp.float32
    scores = jax.lax.dot_general(
        q_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST if f32_inputs else jax.lax.Precision.DEFAULT
        ),
    )
    if use_head:
        alpha = head_ref[0, 0]
        beta = head_ref[0, 1]
        scores = jax.nn.sigmoid(alpha * scores + beta)

    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    valid = rows < n_valid
    valid &= mask_ref[0, :][None, :] > 0.0          # [1,B] broadcasts over Qp
    valid &= rows != excl_ref[0, :][:, None]        # per-query self-exclusion
    scores = jnp.where(valid, scores, _NEG)

    # Threshold skip: if no query sees a score above its running k-th
    # best, this whole block is provably outside every global top-k —
    # write sentinels and move on. The steady-state block then costs one
    # matmul + one max pass (DMA-bound); the k-extraction loop only runs
    # for the handful of blocks that actually carry top-k rows.
    block_max = jnp.max(scores, axis=1)             # [Qp]
    tau = thresh_ref[0, :]
    qp = scores.shape[0]

    @pl.when(jnp.any(block_max > tau))
    def _extract():
        # Iterative max-extraction: k is small (10s), so k cross-lane-reduce
        # passes over the [Qp, B] block cost less than any in-kernel sort.
        s = scores
        kth = block_max
        for j in range(k):
            best = jnp.max(s, axis=1)
            best_idx = jnp.argmax(s, axis=1).astype(jnp.int32)
            out_s_ref[j, :] = best
            out_i_ref[j, :] = best_idx + base
            hit = (
                jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                == best_idx[:, None]
            )
            s = jnp.where(hit, _NEG, s)
            kth = best
        # Rows padding k up to the 8-sublane tile carry the masked sentinel
        # so the global merge can never pick them.
        for j in range(k, k_pad):
            out_s_ref[j, :] = jnp.full((qp,), _NEG, jnp.float32)
            out_i_ref[j, :] = jnp.full((qp,), -1, jnp.int32)
        # tau only grows: the k-th best within any single block lower-bounds
        # nothing ABOVE the global k-th, so max(tau, kth) stays a valid
        # skip threshold.
        thresh_ref[0, :] = jnp.maximum(tau, kth)

    @pl.when(jnp.logical_not(jnp.any(block_max > tau)))
    def _skip():
        for j in range(k_pad):
            out_s_ref[j, :] = jnp.full((qp,), _NEG, jnp.float32)
            out_i_ref[j, :] = jnp.full((qp,), -1, jnp.int32)


def _packed_topk_kernel(
    q_ref,        # [Qp, D] queries, VMEM
    w_ref,        # [B, D] table block, VMEM
    mask_ref,     # [1, B] f32 row-validity (>0 keeps), VMEM
    excl_ref,     # [1, Qp] i32 row to exclude per query (-1: none), VMEM
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
    """Stage-1 candidate extraction (see module docstring): one
    DEFAULT-precision matmul, then per 512-lane group the top_r rows via
    single packed-max passes. The head sigmoid is applied before packing
    because alpha may be negative (order would flip)."""
    b = pl.program_id(0)
    base = b * block_rows
    group = min(GROUP, block_rows)
    n_groups = block_rows // group

    scores = jax.lax.dot_general(
        q_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Qp, B]: table rows on the LANE axis (full 8x128 VPU occupancy)
    if use_head:
        scores = jax.nn.sigmoid(head_ref[0, 0] * scores + head_ref[0, 1])

    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
    valid = rows < n_valid
    valid &= mask_ref[0, :][None, :] > 0.0          # [1,B] broadcasts over Qp
    valid &= rows != excl_ref[0, :][:, None]        # per-query self-exclusion
    scores = jnp.where(valid, scores, _NEG)

    key = _float_key(scores)
    lane = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) % group
    packed = (key & jnp.int32(~((1 << IDX_BITS) - 1))) | lane

    qp = scores.shape[0]
    for g in range(n_groups):
        sub = packed[:, g * group:(g + 1) * group]
        for j in range(top_r):
            best = jnp.max(sub, axis=1)             # max IS argmax (packed)
            out_s_ref[g * top_r + j, :] = best
            out_i_ref[g * top_r + j, :] = (
                base + g * group + (best & jnp.int32((1 << IDX_BITS) - 1))
            )
            sub = jnp.where(sub == best[:, None], jnp.int32(_INT_MIN), sub)
    for j in range(n_groups * top_r, r_pad):
        out_s_ref[j, :] = jnp.full((qp,), _INT_MIN, jnp.int32)
        out_i_ref[j, :] = jnp.full((qp,), -1, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_rows", "interpret", "use_head", "lane_pad", "exact_scan"
    ),
)
def masked_topk(
    table: jax.Array,            # [N, D]
    queries: jax.Array,          # [Qn, D]
    k: int,
    mask: jax.Array | None = None,      # [N] bool/float; True/.>0 keeps the row
    exclude: jax.Array | None = None,   # [Qn] int32 row index to drop (-1: none)
    head: jax.Array | None = None,      # [2] (alpha, beta) -> sigmoid(alpha*s+beta)
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
    use_head: bool = False,
    lane_pad: int = 8,
    exact_scan: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Top-k of (optionally transformed) ``table @ queries.T`` scores.

    Returns (values [Qn, k], indices [Qn, k]) sorted descending; values are
    exact f32 HIGHEST-precision scores. Rows masked out / excluded / beyond
    N can only appear when fewer than k valid rows exist; they carry score
    <= -1e30. Default is the two-stage packed scan + exact rescore;
    ``exact_scan=True`` forces the worst-case-exact single-stage kernel
    (module docstring discusses the trade).
    """
    if use_head and head is None:
        raise ValueError("use_head=True requires a head=(alpha, beta) array")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = table.shape
    qn = queries.shape[0]
    itemsize = jnp.dtype(table.dtype).itemsize
    block_rows = min(block_rows, _round_up(n, 8))
    # VMEM guard: the unrolled extraction keeps a few live [qp, B] f32
    # copies plus the double-buffered table block; clamp the block so scoped
    # VMEM stays well under the ~16 MB budget. The bound is on table BYTES
    # per block, so bf16 tables stream 2x the rows per grid step.
    while block_rows > 512 and block_rows * d * itemsize > 2 * 1024 * 1024:
        block_rows //= 2
    # Single-block grids gain nothing from the Pallas pipeline (no DMA to
    # overlap) and pay a full Mosaic compile — on remote-attached TPUs that
    # compile can queue for minutes behind other tenants. XLA fuses the
    # equivalent matmul + mask + top_k directly at this size.
    if n <= block_rows and not interpret:
        return _xla_topk(table, queries, k, mask, exclude, head, use_head)
    if k > block_rows:
        raise ValueError(f"k={k} must be <= block_rows={block_rows}")

    qp = _round_up(max(qn, 1), lane_pad)
    # The table is NOT padded: a ragged trailing block reads undefined rows,
    # which the kernels kill via the rows < n_valid mask. Padding here would
    # jnp.pad-COPY the whole table in HBM every call — measured at ~0.5 ms
    # of the old 1.08 ms per q8 scan at 350K rows (NOTES_PERF.md round 3).
    nb = -(-n // block_rows)

    queries_p = jnp.pad(
        queries.astype(table.dtype), ((0, qp - qn), (0, 0))
    )
    if mask is None:
        mask_row = jnp.ones((1, n), jnp.float32)
    else:
        mask_row = mask.astype(jnp.float32).reshape(1, n)
    if exclude is None:
        excl_row = jnp.full((1, qp), -1, jnp.int32)
    else:
        excl_row = jnp.pad(
            exclude.astype(jnp.int32).reshape(1, qn),
            ((0, 0), (0, qp - qn)),
            constant_values=-1,
        )
    if head is None:
        head_arr = jnp.zeros((1, 2), jnp.float32)
    else:
        head_arr = head.astype(jnp.float32).reshape(1, 2)

    if exact_scan:
        return _exact_scan_topk(
            table, queries_p, mask_row, excl_row, head_arr,
            k=k, n=n, qn=qn, qp=qp, nb=nb, block_rows=block_rows,
            use_head=use_head, interpret=interpret,
        )

    # ---- stage 1: packed grouped candidate scan --------------------------------
    # A block must be a whole number of GROUPs or tail rows would be
    # matmul'd but never extraction candidates.
    if block_rows > GROUP and block_rows % GROUP:
        raise ValueError(f"block_rows={block_rows} not a multiple of {GROUP}")
    group = min(GROUP, block_rows)
    n_groups = block_rows // group
    m = min(max(4 * k, 64), n)
    # Per-group depth: a true-top-k miss needs >top_r of the k winners in
    # ONE 512-row group (same policy as ops/quantized.py stage 1).
    top_r = max(3, -(-m // max(nb * n_groups, 1)) + 1)
    top_r = min(top_r, group)
    r_pad = _round_up(n_groups * top_r, 8)

    kernel = functools.partial(
        _packed_topk_kernel,
        top_r=top_r, r_pad=r_pad, block_rows=block_rows, n_valid=n,
        use_head=use_head,
    )
    block_s, block_i = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
    )(queries_p, table, mask_row, excl_row, head_arr)

    # ---- stage 2: exact f32 rescore of the pooled candidates -------------------
    cand_keys = block_s.T[:qn]           # packed int32; int order == score order
    cand_rows = block_i.T[:qn]
    _, pos = jax.lax.top_k(cand_keys, m)
    cand = jnp.take_along_axis(cand_rows, pos, axis=1)
    keys = jnp.take_along_axis(cand_keys, pos, axis=1)
    # A key at the packed sentinel is exhausted/masked padding — it must
    # stay dead, not rescored (its lane bits could alias a live row).
    alive = (cand >= 0) & (keys > key_threshold(_NEG / 2))
    safe = jnp.clip(cand, 0, n - 1)
    rows = table[safe].astype(jnp.float32)                    # [Qn, m, D]
    scores = jnp.einsum(
        "qd,qmd->qm", queries[:qn].astype(jnp.float32), rows,
        precision=jax.lax.Precision.HIGHEST,
    )
    if use_head:
        scores = jax.nn.sigmoid(head[0] * scores + head[1])
    scores = jnp.where(alive, scores, _NEG)
    cand = jnp.where(alive, cand, -1)
    kk = min(k, m)
    top_s, pos2 = jax.lax.top_k(scores, kk)
    top_i = jnp.take_along_axis(cand, pos2, axis=1)
    if k > kk:
        top_s = jnp.pad(top_s, ((0, 0), (0, k - kk)), constant_values=_NEG)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - kk)), constant_values=-1)
    return top_s, top_i


def _exact_scan_topk(
    table, queries_p, mask_row, excl_row, head_arr,
    *, k, n, qn, qp, nb, block_rows, use_head, interpret,
):
    """Single-stage worst-case-exact path: HIGHEST-precision scan with the
    running-threshold block skip (_topk_kernel)."""
    d = table.shape[1]
    k_pad = _round_up(k, 8)
    qlive_row = jnp.pad(jnp.ones((1, qn), jnp.float32), ((0, 0), (0, qp - qn)))
    kernel = functools.partial(
        _topk_kernel,
        k=k, k_pad=k_pad, block_rows=block_rows, n_valid=n, use_head=use_head,
    )
    block_s, block_i = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((k_pad, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb * k_pad, qp), jnp.float32),
            jax.ShapeDtypeStruct((nb * k_pad, qp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((8, qp), jnp.float32)],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # The grid must run in order: the running-threshold scratch
            # carries across blocks (skip logic). The table block DMA still
            # software-pipelines ahead of the (usually skipped) extraction.
            dimension_semantics=("arbitrary",),
        ),
    )(queries_p, table, mask_row, excl_row, qlive_row, head_arr)

    # Exact global merge over nb*k candidates per query (tiny, XLA top_k).
    cand_s = block_s.T  # [qp, nb*k]
    cand_i = block_i.T
    top_s, pos = jax.lax.top_k(cand_s, k)
    top_i = jnp.take_along_axis(cand_i, pos, axis=1)
    return top_s[:qn], top_i[:qn]


def _xla_topk(
    table: jax.Array,
    queries: jax.Array,
    k: int,
    mask: jax.Array | None,
    exclude: jax.Array | None,
    head: jax.Array | None,
    use_head: bool,
) -> tuple[jax.Array, jax.Array]:
    """Dense masked top-k with the exact semantics of the kernel path, for
    tables small enough that the Pallas grid would be a single block."""
    n, _ = table.shape
    qn = queries.shape[0]
    f32_inputs = table.dtype == jnp.float32
    scores = jax.lax.dot_general(
        queries.astype(table.dtype), table,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST if f32_inputs else jax.lax.Precision.DEFAULT
        ),
    )  # [Qn, N]
    if use_head:
        scores = jax.nn.sigmoid(head[0] * scores + head[1])
    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    valid = jnp.ones(scores.shape, bool)
    if mask is not None:
        valid &= (mask.astype(jnp.float32) > 0.0)[None, :]
    if exclude is not None:
        valid &= rows != exclude.astype(jnp.int32)[:, None]
    scores = jnp.where(valid, scores, _NEG)
    top_s, top_i = jax.lax.top_k(scores, min(k, n))
    if k > n:  # pad out to k with sentinels, matching the kernel contract
        top_s = jnp.pad(top_s, ((0, 0), (0, k - n)), constant_values=_NEG)
        top_i = jnp.pad(top_i, ((0, 0), (0, k - n)), constant_values=-1)
    return top_s[:qn], top_i[:qn].astype(jnp.int32)


def cosine_topk(
    table_normalized: jax.Array,
    query_rows: jax.Array,
    k: int,
    mask: jax.Array | None = None,
    exclude: jax.Array | None = None,
    **kwargs,
) -> tuple[jax.Array, jax.Array]:
    """Top-k cosine similarity of query rows against a row-normalized table.

    The reference computes np.dot(weights, weights[idx]) + full argsort
    (similar_anime.py:404-408); here the query rows are assumed to be rows
    of the normalized table (or any normalized vectors) and the scan is a
    single fused kernel pass.
    """
    if query_rows.ndim == 1:
        query_rows = query_rows[None, :]
    from anime_recommendations_tpu.ops.quantized import QuantizedTable, quantized_topk

    if isinstance(table_normalized, QuantizedTable):
        return quantized_topk(
            table_normalized, query_rows, k, mask=mask, exclude=exclude, **kwargs
        )
    return masked_topk(
        table_normalized, query_rows, k, mask=mask, exclude=exclude, **kwargs
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
