"""IVF vs exact-scan retrieval at 4M rows (ops/ivf.py) — one v5e chip.

Measures, on a 4M x 128 low-rank table (rank-16 latent factors projected
to D=128 and row-normalized — the geometry trained embedding tables
actually have, unlike iid-normal rows which have no cluster structure to
find):
  * IVF build time (spherical k-means, matmul-form Lloyd's)
  * recall@10 vs the exact scan at probes = 4 / 8 / 16 / 32
  * chained per-call latency at serving (q=1) and batched (q=8) widths
  * the exact two-stage Pallas scan at the same widths for contrast

Chained-latency caveat: per-call host dispatch through the tunnel is
included (~0.1-0.5 ms under load; worse under contention) — read deltas
between variants measured in the same run, not absolutes (NOTES_PERF.md
measurement notes).

Run: timeout 1500 python runs_full/exp_r5_ivf.py
"""

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from anime_recommendations_tpu.ops.ivf import build_ivf, ivf_topk
    from anime_recommendations_tpu.ops.topk import masked_topk

    rng = np.random.default_rng(0)
    n, d, lat = 4_000_000, 128, 16
    u = jnp.asarray(rng.standard_normal((n, lat)).astype(np.float32))
    proj = jnp.asarray(
        rng.standard_normal((lat, d)).astype(np.float32) / np.sqrt(lat)
    )

    @jax.jit
    def mk(u, proj):
        w = u @ proj
        return w / jnp.linalg.norm(w, axis=1, keepdims=True)

    t0 = time.time()
    wd = mk(u, proj)
    float(wd[0, 0])
    print(f"table build (device): {time.time() - t0:.1f} s", flush=True)
    del u

    t0 = time.time()
    index = build_ivf(wd, n_clusters=2048, iters=8, seed=3)
    float(index.centroids[0, 0])
    spill = int(np.sum(np.asarray(index.spill) >= 0))
    print(
        f"ivf build: {time.time() - t0:.1f} s  cap={index.bucket_cap} "
        f"spill={spill}", flush=True,
    )

    qi = rng.integers(0, n, 64)
    q = wd[jnp.asarray(qi)]
    ex_v, ex_i = masked_topk(wd, q, 10, exact_scan=True)
    ex_i = np.asarray(ex_i)

    def chained_ms(fn, queries, iters=24):
        jax.block_until_ready(fn(queries[0]))
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for i in range(iters):
                out = fn(queries[i % len(queries)])
            jax.block_until_ready(out)
            best = min(best, (time.time() - t0) / iters * 1e3)
        return best

    q1s = [q[i:i + 1] for i in range(16)]
    q8s = [q[i:i + 8] for i in range(0, 56, 8)]

    for p in (4, 8, 16, 32):
        _, ids = ivf_topk(index, q, 10, probes=p)
        ids = np.asarray(ids)
        rec = np.mean(
            [len(set(ids[r]) & set(ex_i[r])) / 10 for r in range(len(qi))]
        )
        ms1 = chained_ms(lambda x: ivf_topk(index, x, 10, probes=p)[0], q1s)
        ms8 = chained_ms(lambda x: ivf_topk(index, x, 10, probes=p)[0], q8s)
        print(
            f"probes={p:3d}: recall@10={rec:.4f}  q1={ms1:.3f} ms  "
            f"q8={ms8:.3f} ms", flush=True,
        )

    ms1 = chained_ms(lambda x: masked_topk(wd, x, 10)[0], q1s)
    ms8 = chained_ms(lambda x: masked_topk(wd, x, 10)[0], q8s)
    print(f"exact twostage: q1={ms1:.3f} ms  q8={ms8:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
