"""Pallas kernels vs numpy oracles (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anime_recommendations_tpu.models import two_tower as tt
from anime_recommendations_tpu.ops.normalize import l2_normalize_rows
from anime_recommendations_tpu.ops.scoring import head_affine, score_all_items, score_topk
from anime_recommendations_tpu.ops.topk import cosine_topk, masked_topk


def normed(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def table():
    rng = np.random.default_rng(1)
    return normed(rng.normal(size=(500, 64)).astype(np.float32))


def test_l2_normalize_rows_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 48)).astype(np.float32) * 10
    out = np.asarray(l2_normalize_rows(jnp.asarray(x)))
    np.testing.assert_allclose(out, normed(x), rtol=1e-5)


def test_l2_normalize_rows_unaligned_rows():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(37, 16)).astype(np.float32)
    out = np.asarray(l2_normalize_rows(jnp.asarray(x)))
    np.testing.assert_allclose(out, normed(x), rtol=1e-5)


def oracle_topk(scores, k):
    idx = np.argsort(-scores, kind="stable")[:k]
    return scores[idx], idx


def test_cosine_topk_matches_oracle(table):
    q = table[[3, 77, 123]]
    vals, idx = cosine_topk(jnp.asarray(table), jnp.asarray(q), k=7, block_rows=128)
    vals, idx = np.asarray(vals), np.asarray(idx)
    for row, qi in enumerate([3, 77, 123]):
        ref_scores = table @ table[qi]
        ref_v, _ = oracle_topk(ref_scores, 7)
        np.testing.assert_allclose(vals[row], ref_v, rtol=1e-5)
        # Self is included when not excluded (reference drops it afterwards).
        assert idx[row, 0] == qi
        np.testing.assert_allclose(
            ref_scores[idx[row]], vals[row], rtol=1e-5
        )


def test_exclude_self(table):
    q = table[[10, 20]]
    vals, idx = cosine_topk(
        jnp.asarray(table), jnp.asarray(q), k=5,
        exclude=jnp.asarray([10, 20]), block_rows=128,
    )
    idx = np.asarray(idx)
    assert 10 not in idx[0] and 20 not in idx[1]
    ref = np.delete(table @ table[10], 10)
    np.testing.assert_allclose(np.asarray(vals)[0, 0], ref.max(), rtol=1e-5)


def test_row_mask(table):
    keep = np.zeros(len(table), bool)
    keep[:100] = True
    vals, idx = cosine_topk(
        jnp.asarray(table), jnp.asarray(table[[5]]), k=4,
        mask=jnp.asarray(keep), block_rows=128,
    )
    assert np.asarray(idx).max() < 100
    ref_v, ref_i = oracle_topk((table @ table[5])[:100], 4)
    np.testing.assert_allclose(np.asarray(vals)[0], ref_v, rtol=1e-5)


def test_fewer_valid_rows_than_k(table):
    keep = np.zeros(len(table), bool)
    keep[:3] = True
    vals, idx = masked_topk(
        jnp.asarray(table), jnp.asarray(table[[0]]), k=8,
        mask=jnp.asarray(keep), block_rows=128,
    )
    vals = np.asarray(vals)[0]
    assert (vals[:3] > -1e29).all() and (vals[3:] <= -1e29).all()


def test_unaligned_table_size():
    rng = np.random.default_rng(2)
    tab = normed(rng.normal(size=(333, 32)).astype(np.float32))
    vals, idx = cosine_topk(jnp.asarray(tab), jnp.asarray(tab[[7]]), k=5, block_rows=128)
    ref_v, _ = oracle_topk(tab @ tab[7], 5)
    np.testing.assert_allclose(np.asarray(vals)[0], ref_v, rtol=1e-5)
    assert np.asarray(idx).max() < 333


def test_score_topk_matches_model_predict():
    params = tt.init_params(jax.random.PRNGKey(3), n_users=40, n_anime=200,
                            embedding_size=32)
    # Perturb head/bn so the affine fold is non-trivial.
    params = params._replace(dense_w=jnp.float32(1.7), dense_b=jnp.float32(-0.3),
                             bn_gamma=jnp.float32(0.9), bn_beta=jnp.float32(0.2))
    bn = tt.BNState(moving_mean=jnp.float32(0.1), moving_var=jnp.float32(1.4))

    user_index = 17
    full = np.asarray(score_all_items(params, bn, jnp.int32(user_index)))
    # Oracle: the model's own predict over every anime.
    preds = np.asarray(
        tt.predict(params, bn,
                   jnp.full(200, user_index, jnp.int32), jnp.arange(200))
    )
    np.testing.assert_allclose(full, preds, rtol=1e-5)

    anime_n, user_n = tt.normalized_tables(params)
    watched = np.zeros(200, bool)
    watched[[5, 6, 7]] = True
    vals, idx = score_topk(
        anime_n, user_n[user_index], head_affine(params, bn), k=6,
        mask=jnp.asarray(~watched), block_rows=128,
    )
    vals, idx = np.asarray(vals)[0], np.asarray(idx)[0]
    masked = preds.copy()
    masked[watched] = -np.inf
    ref_v, ref_i = oracle_topk(masked, 6)
    np.testing.assert_allclose(vals, ref_v, rtol=1e-5)
    assert not set(idx) & {5, 6, 7}


def test_batched_queries_independent(table):
    qs = table[[1, 2, 3, 4, 5, 6, 7, 8, 9]]
    vals, idx = cosine_topk(jnp.asarray(table), jnp.asarray(qs), k=3, block_rows=256)
    for row, qi in enumerate(range(1, 10)):
        ref_v, _ = oracle_topk(table @ table[qi], 3)
        np.testing.assert_allclose(np.asarray(vals)[row], ref_v, rtol=1e-5)


def test_topk_k1_and_tiny_table():
    tab = normed(np.random.default_rng(5).normal(size=(12, 16)).astype(np.float32))
    vals, idx = cosine_topk(jnp.asarray(tab), jnp.asarray(tab[[3]]), k=1, block_rows=128)
    assert np.asarray(idx)[0, 0] == 3  # self is its own best match
    vals, idx = cosine_topk(jnp.asarray(tab), jnp.asarray(tab[[3]]), k=12, block_rows=128)
    assert sorted(np.asarray(idx)[0].tolist()) == list(range(12))


def test_topk_large_k_across_blocks():
    rng = np.random.default_rng(6)
    tab = normed(rng.normal(size=(600, 32)).astype(np.float32))
    vals, idx = cosine_topk(jnp.asarray(tab), jnp.asarray(tab[[0]]), k=50, block_rows=128)
    ref = np.sort(tab @ tab[0])[::-1][:50]
    np.testing.assert_allclose(np.asarray(vals)[0], ref, rtol=1e-5)


def test_topk_bf16_table_close_to_f32(table):
    q = table[[9]]
    v32, i32 = cosine_topk(jnp.asarray(table), jnp.asarray(q), k=5, block_rows=128)
    v16, i16 = cosine_topk(
        jnp.asarray(table, dtype=jnp.bfloat16),
        jnp.asarray(q, dtype=jnp.bfloat16), k=5, block_rows=128,
    )
    np.testing.assert_allclose(np.asarray(v16)[0], np.asarray(v32)[0], atol=2e-2)
    assert len(set(np.asarray(i16)[0]) & set(np.asarray(i32)[0])) >= 3


def test_small_table_xla_path_matches_kernel_path():
    # n <= block_rows + interpret=False routes to the dense XLA path (on
    # remote TPUs a single-block Mosaic compile can queue for minutes);
    # both paths must agree exactly.
    rng = np.random.default_rng(11)
    W = rng.standard_normal((100, 32)).astype(np.float32)
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    q = W[:5]
    mask = rng.uniform(size=100) > 0.4
    excl = np.arange(5, dtype=np.int32)
    kw = dict(mask=jnp.asarray(mask), exclude=jnp.asarray(excl))
    v_x, i_x = masked_topk(jnp.asarray(W), jnp.asarray(q), 7,
                           interpret=False, **kw)
    v_k, i_k = masked_topk(jnp.asarray(W), jnp.asarray(q), 7,
                           interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_k))
    np.testing.assert_allclose(np.asarray(v_x), np.asarray(v_k), rtol=1e-6)
    # k > n pads with sentinels instead of erroring.
    v_p, i_p = masked_topk(jnp.asarray(W[:4]), jnp.asarray(q), 6,
                           interpret=False)
    assert np.asarray(i_p).shape == (5, 6)
    assert (np.asarray(i_p)[:, 4:] == -1).all()


def test_quantized_topk_exact_after_rescore():
    from anime_recommendations_tpu.ops.quantized import quantize_rows, quantized_topk

    rng = np.random.default_rng(21)
    n, d, qn, k = 3000, 64, 6, 10
    W = rng.standard_normal((n, d)).astype(np.float32)
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    qt = quantize_rows(jnp.asarray(W))
    q = W[:qn]
    mask = rng.uniform(size=n) > 0.25
    excl = np.arange(qn, dtype=np.int32)

    vals, idx = quantized_topk(
        qt, jnp.asarray(q), k, mask=jnp.asarray(mask),
        exclude=jnp.asarray(excl), block_rows=1024,
    )
    scores = q @ W.T
    scores[:, ~mask] = -np.inf
    for r, e in enumerate(excl):
        scores[r, e] = -np.inf
    oracle = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(idx), oracle)
    # Rescored values are exact f32 cosines, not int8 approximations.
    np.testing.assert_allclose(
        np.asarray(vals),
        np.take_along_axis(scores, oracle, axis=1),
        rtol=1e-5,
    )


def test_quantized_topk_default_block_covers_tail_rows():
    """Regression: n=3000 with DEFAULT block_rows used to produce a 3008-row
    block whose last 448 rows (past the 5 full 512-lane groups) were matmul'd
    but never extraction candidates — true top-k rows in the tail were
    silently dropped (a query's exact self-match missing from its results).
    block_rows must always be a GROUP multiple so every row is a stage-1
    candidate."""
    from anime_recommendations_tpu.ops.quantized import quantize_rows, quantized_topk

    rng = np.random.default_rng(33)
    n, d, k = 3000, 64, 10
    W = rng.standard_normal((n, d)).astype(np.float32)
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    qt = quantize_rows(jnp.asarray(W))
    # Queries ARE tail rows: their self-match (cosine 1.0) must come back.
    tail_rows = np.arange(2560, 3000, 40, dtype=np.int32)
    vals, idx = quantized_topk(qt, jnp.asarray(W[tail_rows]), k)
    idx = np.asarray(idx)
    for r, row in enumerate(tail_rows):
        assert row in idx[r], f"self-match {row} missing from top-{k}: {idx[r]}"
    scores = W[tail_rows] @ W.T
    oracle = np.argsort(-scores, axis=1)[:, :k]
    np.testing.assert_array_equal(idx, oracle)


def test_quantized_topk_single_block_and_k_gt_valid():
    from anime_recommendations_tpu.ops.quantized import quantize_rows, quantized_topk

    rng = np.random.default_rng(22)
    W = rng.standard_normal((100, 32)).astype(np.float32)
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    qt = quantize_rows(jnp.asarray(W))
    mask = np.zeros(100, bool)
    mask[:5] = True  # only 5 valid rows, k=8 -> sentinel tail
    vals, idx = quantized_topk(
        qt, jnp.asarray(W[:2]), 8, mask=jnp.asarray(mask)
    )
    vals, idx = np.asarray(vals), np.asarray(idx)
    assert (idx[:, :5] < 5).all()
    assert (vals[:, 5:] <= -1e29).all()


def test_topk_threshold_skip_ascending_scores():
    """Adversarial order for the running-threshold skip: scores strictly
    increase with row index, so EVERY block beats the threshold and the
    true top-k lives in the LAST block — a wrong skip would be visible."""
    import numpy as np
    from anime_recommendations_tpu.ops.topk import masked_topk

    n, d = 4096 + 513, 16  # multi-block with a ragged tail
    rng = np.random.default_rng(0)
    q = rng.standard_normal((3, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    # Rows proportional to q0 with growing magnitude after normalization
    # tricks don't apply (cosine is scale-free); instead build rows whose
    # cosine with each query increases with index: interpolate toward q0.
    base = rng.standard_normal((n, d)).astype(np.float32)
    t = np.linspace(0, 1, n, dtype=np.float32)[:, None] ** 2
    W = (1 - t) * base + t * 40.0 * q[0]
    W /= np.linalg.norm(W, axis=1, keepdims=True)

    vals, idx = masked_topk(
        jnp.asarray(W), jnp.asarray(q), k=7, block_rows=1024, exact_scan=True
    )
    scores = W @ q.T
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(3):
        # Value-exact (the construction saturates cosine near 1.0, so index
        # sets are tie-ambiguous); indices must score what they claim.
        np.testing.assert_allclose(
            vals[i], np.sort(scores[:, i])[::-1][:7], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(scores[idx[i], i], vals[i], rtol=1e-6)
    # The default two-stage path on the same adversarial data: exact within
    # the documented stage-1 tie window (module docstring).
    vals2, idx2 = masked_topk(jnp.asarray(W), jnp.asarray(q), k=7,
                              block_rows=1024)
    vals2, idx2 = np.asarray(vals2), np.asarray(idx2)
    for i in range(3):
        np.testing.assert_allclose(scores[idx2[i], i], vals2[i], rtol=1e-6)
        np.testing.assert_allclose(
            vals2[i], np.sort(scores[:, i])[::-1][:7], rtol=4e-3, atol=2e-4
        )


def _adversarial_tied_table():
    """Hundreds of rows within a float-tie of each other in the first block —
    the worst case for the packed-key extraction (truncated keys tie)."""
    import numpy as np

    n, d = 3072, 16
    rng = np.random.default_rng(1)
    q = rng.standard_normal((2, d)).astype(np.float32)
    base = rng.standard_normal((n, d)).astype(np.float32)
    t = np.linspace(1, 0, n, dtype=np.float32)[:, None] ** 2
    W = (1 - t) * base + t * 40.0 * q[1]
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    return W, q


def test_topk_descending_scores_triggers_skips():
    """exact_scan: top-k all in the FIRST block — later blocks must be
    skipped yet still emit sentinel candidates that the merge ignores."""
    import numpy as np
    from anime_recommendations_tpu.ops.topk import masked_topk

    W, q = _adversarial_tied_table()
    vals, idx = masked_topk(
        jnp.asarray(W), jnp.asarray(q), k=5, block_rows=512, exact_scan=True
    )
    scores = W @ q.T
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(2):
        np.testing.assert_allclose(
            vals[i], np.sort(scores[:, i])[::-1][:5], rtol=1e-6, atol=1e-7
        )
        np.testing.assert_allclose(scores[idx[i], i], vals[i], rtol=1e-6)


def test_topk_two_stage_adversarial_ties_bounded():
    """The default two-stage path on the tied table: returned values must be
    the EXACT scores of real returned rows, within the truncated-key tie
    window (~2^-9 relative) of the true optimum — the documented worst-case
    deviation of the packed extraction (ops/topk.py module docstring)."""
    import numpy as np
    from anime_recommendations_tpu.ops.topk import masked_topk

    W, q = _adversarial_tied_table()
    vals, idx = masked_topk(jnp.asarray(W), jnp.asarray(q), k=5, block_rows=512)
    scores = W @ q.T
    vals, idx = np.asarray(vals), np.asarray(idx)
    for i in range(2):
        # Self-consistency: values are the true scores of the returned rows.
        np.testing.assert_allclose(scores[idx[i], i], vals[i], rtol=1e-6)
        # Near-optimality within the tie window.
        oracle = np.sort(scores[:, i])[::-1][:5]
        np.testing.assert_allclose(vals[i], oracle, rtol=4e-3, atol=1e-4)


def test_midsize_table_between_group_and_block():
    """Regression: 512 < n < 2048 with n not a 512-multiple used to raise
    (block_rows=round_up(n,8) wasn't a GROUP multiple) on the kernel path —
    the serving user table hits exactly this band on small corpora. The
    block must round DOWN to a group multiple with the remainder scored by
    the XLA tail."""
    rng = np.random.default_rng(3)
    for n in (1147, 513, 1536, 2040):
        W = rng.standard_normal((n, 32)).astype(np.float32)
        W /= np.linalg.norm(W, axis=1, keepdims=True)
        vals, idx = masked_topk(jnp.asarray(W), jnp.asarray(W[:3]), 5,
                                interpret=True)
        sc = W[:3] @ W.T
        oracle = np.argsort(-sc, axis=1)[:, :5]
        np.testing.assert_array_equal(np.asarray(idx), oracle)
