"""Benchmark: training throughput + retrieval QPS on the local accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "details": {...}}

Baseline (BASELINE.md): the reference trains 20 epochs over the 7M-row
parquet in <15 min on a Colab TPU v2-8 => 140M examples / 900 s ≈ 155,556
examples/s for the whole training step (README.md:82). vs_baseline is our
sustained examples/s over that number. Model/table shapes match the
reference's trained tables (91,641x128 users, 17,560x128 anime,
batch 10,000 — similar_anime.py:156,165, config.yaml:59).

Retrieval detail: fused cosine top-k queries/s over the user table
(350K x 128 — the full-dataset scale from README.md:45) and the anime
table, vs the reference's unpublished single-CPU numpy np.dot+argsort.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from anime_recommendations_tpu.models.two_tower import init_bn_state
    from anime_recommendations_tpu.ops.topk import cosine_topk
    from anime_recommendations_tpu.train.trainer import init_train_state, train_step

    dev = jax.devices()[0]
    details = {"device": str(dev), "backend": jax.default_backend()}

    # ---- training throughput (reference 7M-subset shapes) --------------------
    n_users, n_anime, d, batch = 91_641, 17_560, 128, 10_000
    l2 = 1e-4
    state = init_train_state(jax.random.PRNGKey(0), n_users, n_anime, d)
    rng = np.random.default_rng(0)
    n_batches = 8  # rotate real distinct batches to defeat any caching
    batches = [
        (
            jnp.asarray(rng.integers(0, n_users, batch), jnp.int32),
            jnp.asarray(rng.integers(0, n_anime, batch), jnp.int32),
            jnp.asarray(rng.uniform(0, 1, batch), jnp.float32),
            jnp.ones(batch, jnp.float32),
        )
        for _ in range(n_batches)
    ]
    lr = jnp.float32(5e-5)

    def run_steps(state, n):
        loss = None
        for i in range(n):
            u, a, r, w = batches[i % n_batches]
            state, loss, _ = run_steps.step(state, u, a, r, w, lr, l2)
        return state, loss

    run_steps.step = train_step

    # Warmup (compile) then measure; the host fetch of the final loss bounds
    # the whole chained computation (donated state serializes steps).
    # Best-of-3 segments resists transient contention on shared devices.
    state, loss = run_steps(state, 3)
    float(loss)
    n_steps = 30
    seg_secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = run_steps(state, n_steps)
        float(loss)
        seg_secs.append(time.perf_counter() - t0)
    train_secs = min(seg_secs)
    details["train_step_ms"] = round(train_secs / n_steps * 1e3, 3)
    details["train_per_step_examples_per_sec"] = round(n_steps * batch / train_secs)

    # Device-resident epoch loop (the production path): whole epoch per
    # launch, data staged on device — host dispatch amortized away.
    from anime_recommendations_tpu.data.dataset import RatingsDataset
    from anime_recommendations_tpu.train import device_loop as dl

    n_rows = 2_000_000
    ds = RatingsDataset(
        users=rng.integers(0, n_users, n_rows).astype(np.int32),
        anime=rng.integers(0, n_anime, n_rows).astype(np.int32),
        ratings=rng.uniform(0, 1, n_rows).astype(np.float32),
    )
    data = dl.stage(ds, batch, seed=0)
    key = jax.random.PRNGKey(0)
    epoch_secs_by_opt = {}
    # "adam" = the exact-Keras-parity XLA path; "fused_adam" = identical
    # dense-Adam semantics (to ~2^-17) via one Pallas pass per table
    # (ops/fused_adam.py). The headline takes the faster of the two since
    # both implement the reference's optimizer math.
    for opt in ("adam", "fused_adam"):
        state2 = init_train_state(jax.random.PRNGKey(1), n_users, n_anime, d)
        state2, losses, _, _ = dl.train_epoch(
            state2, data, key, lr, batch, l2, sorted_scatter=True,
            optimizer=opt,
        )
        float(losses[-1])
        seg = []
        for rep in range(3):
            t0 = time.perf_counter()
            state2, losses, _, _ = dl.train_epoch(
                state2, data, jax.random.fold_in(key, rep), lr, batch, l2,
                sorted_scatter=True, optimizer=opt,
            )
            float(losses[-1])
            seg.append(time.perf_counter() - t0)
        epoch_secs_by_opt[opt] = min(seg)
        details[f"train_epoch_{opt}_step_ms"] = round(
            min(seg) / (n_rows / batch) * 1e3, 3
        )
        del state2
    epoch_secs = min(epoch_secs_by_opt.values())
    examples_per_sec = n_rows / epoch_secs
    details["train_epoch_secs_2M_rows"] = round(epoch_secs, 3)
    details["train_examples_per_sec"] = round(examples_per_sec)

    # Full-dataset scale (README.md:45: >350K users): dense Adam vs
    # row-sparse LazyAdam vs the fused single-pass Pallas Adam
    # (ops/fused_adam.py — dense semantics at the 6-HBM-pass floor) on a
    # 350,000 x 128 user table. Dense streams O(table) moments every step;
    # lazy touches only batch rows; fused streams O(table) once.
    n_users_full, full_rows = 350_000, 1_000_000
    ds_full = RatingsDataset(
        users=rng.integers(0, n_users_full, full_rows).astype(np.int32),
        anime=rng.integers(0, n_anime, full_rows).astype(np.int32),
        ratings=rng.uniform(0, 1, full_rows).astype(np.float32),
    )
    data_full = dl.stage(ds_full, batch, seed=0)
    for opt in ("adam", "lazy_adam", "fused_adam"):
        st = init_train_state(jax.random.PRNGKey(2), n_users_full, n_anime, d)
        st, losses, _, _ = dl.train_epoch(
            st, data_full, key, lr, batch, l2, sorted_scatter=True,
            optimizer=opt,
        )
        float(losses[-1])
        seg = []
        for rep in range(3):
            t0 = time.perf_counter()
            st, losses, _, _ = dl.train_epoch(
                st, data_full, jax.random.fold_in(key, 10 + rep), lr, batch,
                l2, sorted_scatter=True, optimizer=opt,
            )
            float(losses[-1])
            seg.append(time.perf_counter() - t0)
        best = min(seg)
        details[f"train350k_{opt}_step_ms"] = round(best / (full_rows / batch) * 1e3, 3)
        details[f"train350k_{opt}_examples_per_sec"] = round(full_rows / best)
        del st
    del data_full, ds_full

    # Routed SPMD step on a 1x1 mesh, same 350K scale: the production
    # multi-chip program (all-to-all exchange plan + owner-side fused
    # Adam, parallel/sharded_train.py) timed on real silicon. The delta
    # vs train350k_fused_adam_step_ms is the routing machinery's cost.
    from anime_recommendations_tpu.parallel.mesh import make_mesh
    from anime_recommendations_tpu.parallel.sharded_train import (
        ShardedTrainStep, place_state,
    )

    mesh1 = make_mesh(1, 1, devices=jax.devices()[:1])
    sstep = ShardedTrainStep(
        mesh1, l2_reg_factor=l2, routing="alltoall", optimizer="fused_adam"
    )
    sh = place_state(
        init_train_state(jax.random.PRNGKey(3), n_users_full, n_anime, d),
        mesh1, routing="alltoall",
    )
    sbatches = [
        (
            jnp.asarray(rng.integers(0, n_users_full, batch), jnp.int32),
            jnp.asarray(rng.integers(0, n_anime, batch), jnp.int32),
            jnp.asarray(rng.uniform(0, 1, batch), jnp.float32),
            jnp.ones(batch, jnp.float32),
        )
        for _ in range(33)
    ]
    sh, sl, _ = sstep.train_step(sh, *sbatches[0], lr)
    float(sl)  # compile + sync
    t0 = time.perf_counter()
    for b in sbatches[1:]:
        sh, sl, _ = sstep.train_step(sh, *b, lr)
    float(sl)
    details["train350k_sharded_fused_step_ms"] = round(
        (time.perf_counter() - t0) / (len(sbatches) - 1) * 1e3, 3
    )
    del sh, sbatches

    # ---- retrieval top-k QPS (full-dataset scale) ----------------------------
    # Dispatch many DISTINCT async calls and sync once: the device executes
    # them in order, so (total - one round-trip) / n isolates device time
    # from host/tunnel latency.
    def topk_qps(n_rows: int, q_batch: int, dtype) -> tuple[float, float, float]:
        W = rng.standard_normal((n_rows, d), dtype=np.float32)
        W /= np.linalg.norm(W, axis=1, keepdims=True)
        Wd = jax.device_put(jnp.asarray(W, dtype=dtype))
        iters = 48
        qs = [
            jax.device_put(
                jnp.asarray(W[(i * q_batch) % (n_rows - q_batch):][:q_batch],
                            dtype=dtype)
            )
            for i in range(iters)
        ]
        jax.block_until_ready(qs)
        np.asarray(cosine_topk(Wd, qs[0], k=10)[0])
        # Best of 3 chained segments resists transient contention; the DMA
        # floor (one table read at HBM BW) guards the other tail — RTT
        # jitter can exceed the device time of small scans.
        per_call = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(cosine_topk(Wd, qs[0], k=10)[0])
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [cosine_topk(Wd, q, k=10) for q in qs]
            np.asarray(outs[-1][0])
            per_call = min(per_call, (time.perf_counter() - t0 - rtt) / iters)
        # Report BOTH the raw measurement and the DMA-floor-clamped value:
        # RTT jitter can make tiny scans measure impossibly fast, but a
        # clamped number must never read as a measurement.
        raw_ms = per_call * 1e3
        dma_floor = n_rows * d * jnp.dtype(dtype).itemsize / 819e9
        per_call = max(per_call, dma_floor)
        return q_batch / per_call, per_call * 1e3, raw_ms

    for name, n_rows in (("anime", 17_560), ("user", 350_000)):
        for tag, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            for q_batch in (8,):
                qps, ms, raw_ms = topk_qps(n_rows, q_batch, dtype)
                details[f"topk_{name}_{tag}_q{q_batch}_qps"] = round(qps)
                details[f"topk_{name}_{tag}_q{q_batch}_ms"] = round(ms, 3)
                details[f"topk_{name}_{tag}_q{q_batch}_ms_raw"] = round(raw_ms, 3)
                if raw_ms < ms:
                    details[f"topk_{name}_{tag}_q{q_batch}_clamped"] = True

    # Batched-throughput variant: ONE kernel call over 256 queries — a
    # single dispatch, so tunnel/host latency cannot pollute the number.
    W = rng.standard_normal((350_000, d), dtype=np.float32)
    W /= np.linalg.norm(W, axis=1, keepdims=True)
    for tag, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        Wd = jax.device_put(jnp.asarray(W, dtype=dtype))
        q1 = jax.device_put(jnp.asarray(W[:256], dtype=dtype))
        q2 = jax.device_put(jnp.asarray(W[256:512], dtype=dtype))
        jax.block_until_ready((q1, q2))
        np.asarray(cosine_topk(Wd, q1, k=10)[0])
        np.asarray(cosine_topk(Wd, q2, k=10)[0])
        samples = []
        fallback = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(cosine_topk(Wd, q1, k=10)[0])
            rtt0 = time.perf_counter() - t0
            # Two sequential dispatches minus one isolate the marginal call.
            t0 = time.perf_counter()
            a = cosine_topk(Wd, q1, k=10)
            b = cosine_topk(Wd, q2, k=10)
            np.asarray(b[0])
            two = time.perf_counter() - t0
            fallback = min(fallback, two / 2)
            if two > rtt0:  # RTT jitter can exceed the marginal call
                samples.append(two - rtt0)
        per = min(samples) if samples else fallback
        details[f"topk_user_{tag}_q256_qps"] = round(256 / per)
        details[f"topk_user_{tag}_q256_ms"] = round(per * 1e3, 3)

    # int8 two-stage retrieval (quantized scan + exact f32 rescore).
    from anime_recommendations_tpu.ops.quantized import quantize_rows, quantized_topk

    qt = jax.device_put(quantize_rows(jnp.asarray(W)))
    for q_batch in (8, 256):
        qs = [
            jax.device_put(
                jnp.asarray(W[(i * q_batch) % (350_000 - q_batch):][:q_batch])
            )
            for i in range(24)
        ]
        jax.block_until_ready(qs)
        np.asarray(quantized_topk(qt, qs[0], k=10)[0])
        per = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(quantized_topk(qt, qs[0], k=10)[0])
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            outs = [quantized_topk(qt, q, k=10) for q in qs]
            np.asarray(outs[-1][0])
            per = min(per, (time.perf_counter() - t0 - rtt) / 24)
        raw_per = per
        per = max(per, 350_000 * d / 819e9)
        details[f"topk_user_int8_q{q_batch}_qps"] = round(q_batch / per)
        details[f"topk_user_int8_q{q_batch}_ms"] = round(per * 1e3, 3)
        details[f"topk_user_int8_q{q_batch}_ms_raw"] = round(raw_per * 1e3, 3)
        if raw_per < per:
            details[f"topk_user_int8_q{q_batch}_clamped"] = True
    vq, iq = quantized_topk(qt, jax.device_put(jnp.asarray(W[:16])), k=10)
    iq = np.asarray(iq)
    sc = W[:16] @ W.T
    orq = np.argsort(-sc, axis=1)[:, :10]
    details["topk_int8_overlap_vs_oracle"] = round(
        float(np.mean([len(set(iq[i]) & set(orq[i])) / 10 for i in range(16)])), 4
    )

    # Retrieval exactness: kernel top-k vs numpy oracle overlap (should be
    # 1.0 for f32 — the parity metric from BASELINE.md).
    Wd = jax.device_put(jnp.asarray(W[:50_000]))
    vals, idx = cosine_topk(Wd, Wd[:16], k=10)
    idx = np.asarray(idx)
    scores = W[:50_000] @ W[:16].T
    oracle = np.argsort(-scores, axis=0)[:10].T
    overlap = np.mean([
        len(set(idx[i]) & set(oracle[i])) / 10 for i in range(16)
    ])
    details["topk_overlap_vs_oracle"] = round(float(overlap), 4)

    baseline_examples_per_sec = 140_000_000 / 900.0  # reference TPU v2-8 run
    print(
        json.dumps(
            {
                "metric": "train_examples_per_sec",
                "value": round(examples_per_sec),
                "unit": "examples/s",
                "vs_baseline": round(examples_per_sec / baseline_examples_per_sec, 3),
                "details": details,
            }
        )
    )


if __name__ == "__main__":
    main()
