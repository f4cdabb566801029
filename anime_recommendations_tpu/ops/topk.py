"""Pallas kernel: fused similarity matmul + masked top-k.

TPU-native replacement for the reference retrieval hot loop
(similar_anime.py:404-408, similar_users.py:293-296): instead of
materializing all N scores in HBM and argsort-ing them on the host, each
grid step streams one row-block of the embedding table through VMEM,
computes the block's scores on the MXU, applies validity masks, and reduces
to a per-block candidate set on the VPU.

Production path (two-stage, shared with ops/quantized.py):
  stage 1 — DEFAULT-precision matmul (one MXU pass even for f32 inputs)
            + grouped packed-max extraction: per 512-lane group the top_r
            best rows fall out of single int32 max passes (score bits
            packed with the lane index, so max IS argmax). The kernel
            emits ONLY packed keys; row indices are reconstructed outside
            from (candidate position, key low bits).
  stage 2 — the pooled candidates are gathered and rescored in exact f32
            (HIGHEST), and the true top-k of the pool returned. The float
            path pools a slim m = max(2k+4, 24) (stage-1 noise only needs
            ~5 noise-widths of slack past k); the int8 path pools
            m = max(4k, k+8). Collision safety is decoupled from pool
            width: the per-group extraction depth covers a
            ~max(4k, 64)-candidate budget even when the pool is slim.

Round-4 redesign (the q=256 batched-query fix — NOTES_PERF.md): the
extraction phase is elementwise work over the full [Qp, B] score surface,
so every avoidable VPU pass costs ~0.09 ms at q=256 over 350K rows.
Changes vs round 3, each one removing whole passes:
  * BIAS-TRICK keys: score + 2.0 is positive for every in-contract score
    (cosine in [-1, 1]; sigmoid head in (0, 1)), and non-negative f32
    bitcasts to a monotone int32 — no sign-fix compare/select. Masked
    slots pack -1.0 (negative key), so liveness is just ``key > 0``.
  * static specialization: the mask / exclude validity passes compile
    only when a mask/exclude is actually passed; the ragged-tail row
    guard runs only in the final grid block (pl.when).
  * keys-only output: out_i writes dropped; index = block*Bk + group*G +
    (key & (G-1)) computed once on the pooled m candidates.
Measured (one v5e chip, 350K x 128, k=10, scan-harness device time;
canonical record = the driver BENCH keys): q=256 3.58 (r03) -> ~1.1 (r04)
-> **~0.85 ms f32 / ~0.90 bf16 / ~0.95 int8** (~300K QPS, exact-oracle
overlap 1.0) after the round-5 block-size sweep (DEFAULT_BLOCK_ROWS note
above); q=8 near the one-table-read DMA floors — f32 ~0.25, bf16 ~0.19,
int8 ~0.08-0.10 (after the round-5 qp_ex extraction-width fix; small-scan
keys jitter up to ~0.1 ms across runs).

``exact_scan=True`` keeps the adversarially-exact single-stage kernel
(HIGHEST-precision scan, running-threshold block skip): stage 1's truncated
keys (9 mantissa bits carry the lane index) could in principle demote a
true top-k row past the pool boundary when >m-k rows tie within ~1e-4
absolute score — impossible to hit with real embedding geometry (bench
tracks overlap on TRAINED tables), but the escape hatch preserves a
worst-case-exact mode. Stage-1 candidate RANKING additionally assumes
scores > -2 (true for every in-repo caller; arbitrary unnormalized tables
with scores below -2 should use exact_scan).

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
# Requested block size; the VMEM guards in masked_topk clamp per dtype —
# f32 tables land on 4096-row blocks, bf16 keeps 8192. Measured round 5
# (350K x 128, q=256 scan-net): f32 1.10 -> 0.845 ms going 2048 -> 4096,
# bf16 1.13 -> 0.899 at 8192 — per-block fixed cost (extraction output
# writes + pipeline bubbles) dominated the old 170-block grid.
DEFAULT_BLOCK_ROWS = 8192

GROUP = 512          # lanes per packed-extraction group (low bits carry lane)
_INT_MIN = -(2 ** 31)  # int32 min as a python int (jnp constants get captured)
_BIAS = 2.0          # score bias making every in-contract score positive


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
    *refs,
    top_r: int,
    r_pad: int,
    block_rows: int,
    use_head: bool,
    has_mask: bool,
    has_excl: bool,
    quantized: bool,
    group: int,
    qp_ex: int,
):
    """Stage-1 candidate extraction (module docstring): one
    DEFAULT-precision matmul, then per ``group``-lane group the top_r rows
    via single packed-max passes. Emits only int32 packed keys whose order
    equals score order and whose low bits carry the in-group lane.

    Ref layout (statically specialized — absent features pass no ref):
      q_ref, [qscale_ref], w_ref, [wscale_ref], [mask_ref], [excl_ref],
      [head_ref], out_k_ref
    """
    it = iter(refs)
    q_ref = next(it)
    qscale_ref = next(it) if quantized else None
    w_ref = next(it)
    wscale_ref = next(it) if quantized else None
    mask_ref = next(it) if has_mask else None
    excl_ref = next(it) if has_excl else None
    head_ref = next(it) if use_head else None
    out_k_ref = next(it)

    b = pl.program_id(0)
    base = b * block_rows

    if quantized:
        acc = jax.lax.dot_general(
            q_ref[:], w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [Qp, B] exact int32
        # int8 operands force a 32-sublane query pad (the (32, 128) int8
        # tile); the extraction is float work, so it runs on the REAL
        # qp_ex <= Qp rows only — at q=8 this is 4x less VPU surface.
        acc = acc[:qp_ex]
        qsc = qscale_ref[0, :qp_ex][:, None]
        if use_head:
            # The head needs TRUE cosines (sigmoid is per-value, not just
            # an ordering): full de-scale before the affine-sigmoid.
            scores = acc.astype(jnp.float32) * qsc * wscale_ref[0, :][None, :]
        else:
            # Stage 1 only needs per-query ORDER: qscale is constant
            # within a query row, so fold it into the bias instead of a
            # second full-surface multiply — s2 = acc*wscale + 2/qscale
            # = (cos + 2)/qscale, which is positive exactly when cos > -2
            # (the same bias-trick contract) and row-monotone in cos.
            scores = acc.astype(jnp.float32) * wscale_ref[0, :][None, :]
            bias = jnp.float32(_BIAS) / qsc
    else:
        scores = jax.lax.dot_general(
            q_ref[:], w_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Qp, B]: table rows on the LANE axis (full 8x128 VPU occupancy)
    if use_head:
        # Applied before packing: alpha may be negative (order would flip).
        scores = jax.nn.sigmoid(head_ref[0, 0] * scores + head_ref[0, 1])

    # Bias-trick key: every in-contract score lands in (0, +inf) after the
    # bias, and non-negative f32s bitcast to a MONOTONE int32 — masked
    # slots get -1.0, whose bitcast is negative (dead iff key <= 0).
    # The grid covers only FULL blocks (the caller scores the < block_rows
    # ragged tail densely in XLA and merges its candidates into the pool),
    # so the kernel is branch-free: no row-bound pass, no pl.when regions.
    if quantized and not use_head:
        s2 = scores + bias
    else:
        s2 = scores + jnp.float32(_BIAS)
    if has_mask or has_excl:
        valid = None
        if has_mask:
            valid = mask_ref[0, :][None, :] > 0.0      # [1,B] broadcasts
        if has_excl:
            rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base
            ex = rows != excl_ref[0, :qp_ex][:, None]
            valid = ex if valid is None else valid & ex
        s2 = jnp.where(valid, s2, -1.0)
    _extract_groups(s2, out_k_ref, top_r=top_r, r_pad=r_pad, group=group)


def _extract_groups(s2, out_k_ref, *, top_r: int, r_pad: int, group: int):
    """Pack + per-group top_r max extraction over biased scores ``s2``.

    3D-reshape form: [Qp, B] -> [Qp, n_groups, group] with the reduce over
    the minor (lane) axis — measured 1.7x faster than per-group slicing at
    q=256 (Mosaic keeps one clean vector loop instead of n_groups separate
    reduce nests). Output rows are ROUND-major: row j*n_groups + g holds
    group g's (j+1)-th best, so each round writes one contiguous [ng, Qp]
    stripe (the tiny [Qp, top_r*ng] transpose happens once per block).

    (Falsified round-5 variants, measured at q=256 over 350K rows: a
    (max, runner-up) tournament reduction for top_r=2 compiled ~9x slower
    — quarter-sliced intermediates are layout poison; a precomputed
    [1, B] lane-row input replacing the iota+AND measured neutral, 1.094
    vs 1.076 ms — Mosaic already hoists the loop-invariant iota.)"""
    key = jax.lax.bitcast_convert_type(s2, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1) & jnp.int32(group - 1)
    packed = (key & jnp.int32(~(group - 1))) | lane
    qp, b = s2.shape
    ng = b // group
    p3 = packed.reshape(qp, ng, group)
    outs = []
    for j in range(top_r):
        c = jnp.max(p3, axis=2)                     # [Qp, ng]; max IS argmax
        outs.append(c)
        if j + 1 < top_r:
            p3 = jnp.where(p3 == c[:, :, None], jnp.int32(_INT_MIN), p3)
    allc = jnp.concatenate(outs, axis=1)            # [Qp, top_r*ng], j-major
    out_k_ref[:top_r * ng, :] = allc.T
    for j in range(top_r * ng, r_pad):
        out_k_ref[j, :] = jnp.full((qp,), _INT_MIN, jnp.int32)


def _packed_candidates(
    table: jax.Array,            # [N, D] f32/bf16 (or int8 when quantized)
    queries_p: jax.Array,        # [Qp, D] padded queries, table dtype
    *,
    m: int,
    n: int,
    qn: int,
    qp: int,
    block_rows: int,
    mask: jax.Array | None,
    exclude_row: jax.Array | None,   # [1, Qp] i32 or None
    head_arr: jax.Array | None,      # [1, 2] f32 or None
    use_head: bool,
    interpret: bool,
    queries_f32: jax.Array,               # [Qn, D] ORIGINAL float queries
    tail_table: jax.Array,                # [N, D] exact rows (f32/bf16)
    tail_k: int,                          # exact tail candidates to keep
    qscale_row: jax.Array | None = None,  # [1, Qp] f32 (quantized only)
    wscale: jax.Array | None = None,      # [N] f32 (quantized only)
    top_r: int | None = None,             # per-group depth (None = policy)
    qp_ex: int | None = None,             # extraction width (None = qp)
) -> tuple[jax.Array, jax.Array]:
    """Shared stage 1 for the float and int8 paths.

    Returns (cand_rows [qn, M], alive [qn, M]): the pooled top-m candidate
    global row indices per query from the FULL-block Pallas scan, plus up
    to ``tail_k`` exact candidates from the < block_rows ragged tail
    (scored densely in XLA — keeping the kernel branch-free measured ~2x
    on the q=256 extraction, since a pl.when'd tail guard predicates the
    whole extraction).
    """
    d = table.shape[1]
    quantized = table.dtype == jnp.int8
    # A block must be a whole number of GROUPs or tail rows would be
    # matmul'd but never extraction candidates.
    if block_rows > GROUP and block_rows % GROUP:
        raise ValueError(f"block_rows={block_rows} not a multiple of {GROUP}")
    group = min(GROUP, block_rows)
    if group & (group - 1):
        raise ValueError(
            f"block_rows={block_rows} below {GROUP} must be a power of two "
            "(the packed key's low bits carry the in-group lane)"
        )
    n_groups = block_rows // group
    nb = n // block_rows                 # FULL blocks only; tail in XLA
    rem = n - nb * block_rows
    # Per-group depth: a true-top-k miss needs >top_r of the k winners in
    # ONE ``group``-row group. Each extra round costs ~2 VPU passes over
    # the full [Qp, N] score surface, so depth is the latency knob:
    #   qp <= 64 (serving queries): top_r=3 — a 4-way 512-row collision is
    #     ~7e-7/query at 350K rows even before the pool slack;
    #   qp > 64 (batched throughput): top_r=2 — a 3-way collision is
    #     ~2.6e-4/query (documented trade; NOTES_PERF round 4 has the
    #     variant table, bench tracks trained-table overlap). Callers can
    #     pin ``top_r`` explicitly; exact_scan remains the exact mode.
    # Both rates assume rows land in groups ~uniformly — a mask that
    # funnels the surviving rows into a few groups breaks that model (see
    # the masked_topk docstring's masked-clustering hazard).
    if top_r is None:
        top_r = 3 if qp <= 64 else 2
    # Depth is decoupled from POOL width: collision safety needs the
    # per-group extraction to cover a ~max(4k, 64)-candidate budget even
    # when the rescore pool is slim (few groups = deep extraction; the
    # cost only matters on LARGE tables, where the group count already
    # makes ceil(cover/groups)+1 collapse to the qp policy above).
    cover = min(max(4 * tail_k, 64), n)
    top_r = max(top_r, -(-cover // max(nb * n_groups, 1)) + 1)
    top_r = min(top_r, group)
    r_pad = _round_up(n_groups * top_r, 8)

    if nb == 0:
        # Whole table smaller than one block (interpret-mode tiny tables;
        # the compiled path shortcuts to _xla_topk before getting here):
        # everything is "tail", no kernel launch at all.
        cand = jnp.zeros((qn, 0), jnp.int32)
        alive = jnp.zeros((qn, 0), bool)
        return _append_tail_candidates(
            cand, alive, n_full=0, rem=rem, tail_table=tail_table,
            queries_f32=queries_f32, qn=qn, mask=mask,
            exclude_row=exclude_row, head_arr=head_arr, use_head=use_head,
            tail_k=tail_k,
        )

    if qp_ex is None:
        qp_ex = qp
    kernel = functools.partial(
        _packed_topk_kernel,
        top_r=top_r, r_pad=r_pad, block_rows=block_rows,
        use_head=use_head, has_mask=mask is not None,
        has_excl=exclude_row is not None, quantized=quantized, group=group,
        qp_ex=qp_ex,
    )
    in_specs = [pl.BlockSpec((qp, d), lambda i: (0, 0), memory_space=pltpu.VMEM)]
    args = [queries_p]
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(qscale_row)
    in_specs.append(
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM))
    args.append(table)
    if quantized:
        in_specs.append(
            pl.BlockSpec((1, block_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM))
        args.append(wscale.reshape(1, n))
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, block_rows), lambda i: (0, i),
                         memory_space=pltpu.VMEM))
        args.append(mask.astype(jnp.float32).reshape(1, n))
    if exclude_row is not None:
        in_specs.append(
            pl.BlockSpec((1, qp), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(exclude_row)
    if use_head:
        in_specs.append(
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM))
        args.append(head_arr)

    block_k = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_pad, qp_ex), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * r_pad, qp_ex), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(*args)

    cand_keys = block_k.T[:qn]           # packed int32; int order == score order
    m_eff = min(m, cand_keys.shape[1])
    keys, pos = jax.lax.top_k(cand_keys, m_eff)
    # Reconstruct global rows from the candidate position + key low bits:
    # pos -> (block, group) — rows are ROUND-major within a block (row
    # j*ng + g, see _extract_groups) — and key & (group-1) is the lane.
    blk = pos // r_pad
    grp = (pos % r_pad) % n_groups
    cand = blk * block_rows + grp * group + (keys & jnp.int32(group - 1))
    # A non-positive key is a masked / padding slot (bias-trick keys of
    # live scores are strictly positive) — keep it dead.
    alive = keys > 0

    return _append_tail_candidates(
        cand, alive, n_full=nb * block_rows, rem=rem, tail_table=tail_table,
        queries_f32=queries_f32, qn=qn, mask=mask, exclude_row=exclude_row,
        head_arr=head_arr, use_head=use_head, tail_k=tail_k,
    )


def _append_tail_candidates(
    cand, alive, *, n_full, rem, tail_table, queries_f32, qn, mask,
    exclude_row, head_arr, use_head, tail_k,
):
    """Score the trailing < block_rows rows densely in XLA (HIGHEST
    precision — exact) and append the tail's own top-k to the candidate
    pool. Costs one [Qn, rem] matmul; keeps the Pallas grid branch-free
    over full blocks (a pl.when'd tail guard predicates the whole
    extraction — measured ~2x on the q=256 scan)."""
    if not rem:
        return cand, alive
    wt = tail_table[n_full:].astype(jnp.float32)          # [rem, D]
    st = jax.lax.dot_general(
        queries_f32.astype(jnp.float32), wt,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # [Qn, rem]
    if use_head:
        st = jax.nn.sigmoid(head_arr[0, 0] * st + head_arr[0, 1])
    rows_t = jax.lax.broadcasted_iota(jnp.int32, st.shape, 1) + n_full
    valid_t = jnp.ones(st.shape, bool)
    if mask is not None:
        valid_t &= (mask.astype(jnp.float32) > 0.0)[None, n_full:]
    if exclude_row is not None:
        valid_t &= rows_t != exclude_row[0, :qn][:, None]
    st = jnp.where(valid_t, st, _NEG)
    kt = min(tail_k, rem)
    tv, tp = jax.lax.top_k(st, kt)
    cand = jnp.concatenate([cand, tp + n_full], axis=1)
    alive = jnp.concatenate([alive, tv > _NEG / 2], axis=1)
    return cand, alive


def _rescore_pool(
    table_f32: jax.Array,        # [N, D] exact rows (f32 or bf16)
    queries: jax.Array,          # [Qn, D]
    cand: jax.Array,             # [Qn, m]
    alive: jax.Array,            # [Qn, m]
    k: int,
    head: jax.Array | None,
    use_head: bool,
) -> tuple[jax.Array, jax.Array]:
    """Stage 2: exact f32 rescore of the candidate pool, true top-k of it."""
    n = table_f32.shape[0]
    m = cand.shape[1]
    safe = jnp.clip(cand, 0, n - 1)
    rows = table_f32[safe].astype(jnp.float32)                # [Qn, m, D]
    scores = jnp.einsum(
        "qd,qmd->qm", queries.astype(jnp.float32), rows,
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "block_rows", "interpret", "use_head", "lane_pad", "exact_scan",
        "top_r",
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
    top_r: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-k of (optionally transformed) ``table @ queries.T`` scores.

    Returns (values [Qn, k], indices [Qn, k]) sorted descending; values are
    exact f32 HIGHEST-precision scores. Rows masked out / excluded / beyond
    N can only appear when fewer than k valid rows exist; they carry score
    <= -1e30. Default is the two-stage packed scan + exact rescore;
    ``exact_scan=True`` forces the worst-case-exact single-stage kernel
    (module docstring discusses the trade).

    Two-stage contracts (``exact_scan=True`` lifts both):
      * Candidate RANKING assumes scores > -2 (true for cosine over
        normalized rows and for the sigmoid head). On arbitrary
        unnormalized tables, rows scoring <= -2 pack a negative bias-trick
        key and are treated as DEAD — silently dropped from the pool, not
        just mis-ranked.
      * Masked-clustering hazard: the extraction takes the top_r best rows
        per GROUP-lane group of PHYSICAL row positions. A mask/exclusion
        that concentrates nearly all surviving rows into one or two groups
        (e.g. a narrow filter over adjacent vocab ids on an unshuffled
        table) can leave < k live candidates even though >= k valid rows
        exist — returned slots beyond the pool then carry the <= -1e30
        sentinel. The production RecContext path defuses this with a
        build-time ShuffledTable row shuffle; direct callers with highly
        clustered masks should wrap their table in shuffle_rows, raise
        ``top_r``, or pass exact_scan=True.
    """
    if use_head and head is None:
        raise ValueError("use_head=True requires a head=(alpha, beta) array")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = table.shape
    qn = queries.shape[0]
    itemsize = jnp.dtype(table.dtype).itemsize
    # Single-block grids gain nothing from the Pallas pipeline (no DMA to
    # overlap) and pay a full Mosaic compile — on remote-attached TPUs that
    # compile can queue for minutes behind other tenants. XLA fuses the
    # equivalent matmul + mask + top_k directly at this size. Checked
    # against the REQUESTED block size (before group rounding): a mid-size
    # table (GROUP < n <= block_rows, n not a group multiple) would
    # otherwise round down and launch a 1-2 block kernel for nothing.
    if n <= block_rows and not interpret:
        return _xla_topk(table, queries, k, mask, exclude, head, use_head)
    block_rows = min(block_rows, _round_up(n, 8))
    if block_rows < GROUP:  # pow2 so the packed key's lane bits are a mask
        block_rows = 1 << (block_rows - 1).bit_length()
    elif block_rows % GROUP:
        # Mid-size tables (GROUP < n < default block): round DOWN to a
        # whole number of groups; the remainder rides the XLA tail path.
        block_rows -= block_rows % GROUP
    # VMEM guards: (a) the table block plus double-buffering must stay
    # small (bytes bound, so bf16 tables stream 2x the rows per step);
    # (b) the extraction keeps ~2-3 live [qp, B] f32 surfaces, so large
    # query batches shrink the block instead of OOMing scoped VMEM
    # (8 MB per surface measured safe at q=256 x 8192 in round 5; the old
    # 4 MB bound left 2x extraction throughput on the table).
    qp = _round_up(max(qn, 1), lane_pad)
    while block_rows > 512 and block_rows * d * itemsize > 2 * 1024 * 1024:
        block_rows //= 2
    # The packed two-stage extraction holds ~2 [qp, B] surfaces (8 MB each
    # measured safe); the exact_scan kernel's k-round max-extraction keeps
    # more live copies, so it needs the tighter 2 MB bound.
    surface_cap = (2 if exact_scan else 8) * 1024 * 1024
    while block_rows > 512 and qp * block_rows * 4 > surface_cap:
        block_rows //= 2
    if k > block_rows:
        raise ValueError(f"k={k} must be <= block_rows={block_rows}")

    # The table is NOT padded: a ragged trailing block reads undefined rows,
    # which the kernels kill via the rows < n_valid mask. Padding here would
    # jnp.pad-COPY the whole table in HBM every call — measured at ~0.5 ms
    # of the old 1.08 ms per q8 scan at 350K rows (NOTES_PERF.md round 3).
    nb = -(-n // block_rows)

    queries_p = jnp.pad(
        queries.astype(table.dtype), ((0, qp - qn), (0, 0))
    )
    if exclude is None:
        excl_row = None
    else:
        excl_row = jnp.pad(
            exclude.astype(jnp.int32).reshape(1, qn),
            ((0, 0), (0, qp - qn)),
            constant_values=-1,
        )
    head_arr = None if head is None else head.astype(jnp.float32).reshape(1, 2)

    if exact_scan:
        mask_row = (jnp.ones((1, n), jnp.float32) if mask is None
                    else mask.astype(jnp.float32).reshape(1, n))
        ex_row = (jnp.full((1, qp), -1, jnp.int32) if excl_row is None
                  else excl_row)
        h_arr = (jnp.zeros((1, 2), jnp.float32) if head_arr is None
                 else head_arr)
        return _exact_scan_topk(
            table, queries_p, mask_row, ex_row, h_arr,
            k=k, n=n, qn=qn, qp=qp, nb=nb, block_rows=block_rows,
            use_head=use_head, interpret=interpret,
        )

    # Float pool: stage-1 keys carry only DEFAULT-precision (bf16-product)
    # noise ~3e-3 relative plus the ~1e-4 lane truncation; at 350K random
    # rows only ~2 competitor rows sit within one noise-width of the k-th
    # score, so k+14 slack covers ~5 noise-widths (HIGHEST-precision
    # stage 1 measured +1.3 ms at q=256; a slack pool at ~+0.05 ms is the
    # better trade — mass-overlap on 20480 retrievals: 1 tie-window miss).
    m = min(max(2 * k + 4, 24), n)
    cand, alive = _packed_candidates(
        table, queries_p, m=m, n=n, qn=qn, qp=qp, block_rows=block_rows,
        mask=mask, exclude_row=excl_row, head_arr=head_arr,
        use_head=use_head, interpret=interpret, top_r=top_r,
        queries_f32=queries[:qn], tail_table=table, tail_k=k,
    )
    return _rescore_pool(table, queries[:qn], cand, alive, k, head, use_head)


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


from typing import NamedTuple


class ShuffledTable(NamedTuple):
    """A retrieval table stored in a fixed RANDOM physical row order.

    The packed extraction takes the top_r best rows per 512-LANE group;
    group membership is physical row position. Trained embeddings violate
    the random-placement collision model badly: first-appearance vocab puts
    popular rows at adjacent LOW indices, and popular rows train to similar
    directions — a hot query's whole top-k can land in ONE group and get
    truncated to top_r (measured: two-stage vs exact overlap 0.80 on a
    zipf-trained 91K-user table at q=256 / top_r=2, vs 1 miss / 20,480
    retrievals on random tables). One build-time row shuffle restores the
    random model for ANY table geometry; cosine_topk / score_topk
    translate masks, exclusions and returned indices across the
    permutation transparently.

    ``table``: [N, D] array OR a QuantizedTable built from the shuffled
    rows (physical order). ``perm``: [N] physical -> logical row id.
    ``inv``: [N] logical -> physical position.
    """

    table: object
    perm: jax.Array
    inv: jax.Array


def shuffle_rows(table: jax.Array, seed: int = 0) -> ShuffledTable:
    """Build a ShuffledTable (one [N, D] gather at build time)."""
    n = table.shape[0]
    perm = jax.random.permutation(jax.random.PRNGKey(seed), n).astype(jnp.int32)
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return ShuffledTable(table=table[perm], perm=perm, inv=inv)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "use_head", "block_rows", "interpret", "lane_pad", "exact_scan",
        "top_r", "m", "probes",
    ),
)
def _dispatch_topk(
    table,                        # array | QuantizedTable | ShuffledTable
    queries: jax.Array,           # [Qn, D] float
    mask,
    exclude,
    head,
    *,
    k: int,
    use_head: bool = False,
    block_rows: int | None = None,
    interpret: bool | None = None,
    lane_pad: int = 8,
    exact_scan: bool = False,
    top_r: int | None = None,
    m: int | None = None,
    probes: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One jitted entry for every retrieval flavor: the table's pytree
    STRUCTURE (plain array / QuantizedTable / ShuffledTable wrapping
    either, or an IVFIndex for beyond-catalog-scale tables) is static
    under jit, so the shuffle translation, the inner two-stage call and
    the result unpermute all compile into a single program — one dispatch
    per request instead of a chain of eager gathers (which dominated
    serve-path host latency, and on a remote-attached TPU each paid a
    tunnel round-trip)."""
    from anime_recommendations_tpu.ops.ivf import IVFIndex, ivf_topk
    from anime_recommendations_tpu.ops.quantized import QuantizedTable, quantized_topk

    if isinstance(table, IVFIndex):
        if exact_scan:
            return masked_topk(
                table.table, queries, k, mask=mask, exclude=exclude,
                head=head, use_head=use_head,
                interpret=interpret, lane_pad=lane_pad, exact_scan=True,
            )
        return ivf_topk(
            table, queries, k,
            probes=table.n_clusters if probes is None else probes,
            mask=mask, exclude=exclude, head=head, use_head=use_head,
        )

    common = dict(
        interpret=interpret, lane_pad=lane_pad, use_head=use_head, head=head,
        top_r=top_r,
    )

    def inner(t, mask, exclude):
        if isinstance(t, QuantizedTable):
            if exact_scan:
                raise ValueError(
                    "exact_scan is a float-table mode; quantized retrieval "
                    "always exact-rescores its candidate pool instead"
                )
            kw = dict(common)
            if m is not None:
                kw["m"] = m
            if block_rows is not None:
                kw["block_rows"] = block_rows
            return quantized_topk(t, queries, k, mask=mask, exclude=exclude, **kw)
        kw = dict(common, exact_scan=exact_scan)
        if block_rows is not None:
            kw["block_rows"] = block_rows
        return masked_topk(t, queries, k, mask=mask, exclude=exclude, **kw)

    if not isinstance(table, ShuffledTable):
        return inner(table, mask, exclude)
    st = table
    n = st.perm.shape[0]
    mask_p = None if mask is None else jnp.asarray(mask)[st.perm]
    if exclude is None:
        excl_p = None
    else:
        e = exclude.astype(jnp.int32)
        excl_p = jnp.where(e >= 0, st.inv[jnp.clip(e, 0, n - 1)], -1)
    vals, idx_p = inner(st.table, mask_p, excl_p)
    idx = jnp.where(idx_p >= 0, st.perm[jnp.clip(idx_p, 0, n - 1)], idx_p)
    return vals, idx


def cosine_topk(
    table_normalized,
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
    single fused kernel pass. Accepts a plain array, a QuantizedTable, or
    a ShuffledTable wrapping either.
    """
    if query_rows.ndim == 1:
        query_rows = query_rows[None, :]
    head = kwargs.pop("head", None)
    return _dispatch_topk(
        table_normalized, query_rows, mask, exclude, head, k=k, **kwargs
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
