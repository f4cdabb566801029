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

    t0 = time.time()
    index8 = build_ivf(wd, n_clusters=2048, iters=8, seed=3, storage="int8")
    float(index8.centroids[0, 0])
    print(f"ivf int8 build: {time.time() - t0:.1f} s", flush=True)

    qi = rng.integers(0, n, 64)
    q = wd[jnp.asarray(qi)]
    ex_v, ex_i = masked_topk(wd, q, 10, exact_scan=True)
    ex_i = np.asarray(ex_i)

    # Scan-net device time (the bench.py harness): 24 distinct query
    # batches scanned inside ONE program; per-call device time = (total -
    # trivial-scan baseline)/24 — no per-call dispatch in the number.
    iters = 24

    def qstack(width):
        return jnp.stack(
            [wd[jnp.asarray(rng.integers(0, n, width))] for _ in range(iters)]
        )

    def scan_net_ms(fn, handle, qs):
        # The table/index MUST be a jit argument: a closure-captured
        # multi-GB handle becomes a baked-in constant of the traced scan
        # and the compile never finishes (bench.py does the same).
        @jax.jit
        def run(handle, qs):
            def body(acc, qq):
                v, i = fn(handle, qq)
                return acc + jnp.sum(v) + jnp.sum(i.astype(jnp.float32)), None
            return jax.lax.scan(body, jnp.float32(0), qs)[0]

        @jax.jit
        def trivial(qs):
            def body(acc, qq):
                return acc + jnp.sum(qq) * 1.0001, None
            return jax.lax.scan(body, jnp.float32(0), qs)[0]

        float(run(handle, qs)); float(trivial(qs))
        best = base = np.inf
        for _ in range(3):
            t0 = time.time(); float(run(handle, qs)); best = min(best, time.time() - t0)
            t0 = time.time(); float(trivial(qs)); base = min(base, time.time() - t0)
        return (best - base) / iters * 1e3

    qs1, qs8 = qstack(1), qstack(8)
    for label, idx in (("f32", index), ("int8", index8)):
        for p in (4, 8, 16, 32):
            _, ids = ivf_topk(idx, q, 10, probes=p)
            ids = np.asarray(ids)
            rec = np.mean(
                [len(set(ids[r]) & set(ex_i[r])) / 10 for r in range(len(qi))]
            )
            ms1 = scan_net_ms(
                lambda h, x: ivf_topk(h, x, 10, probes=p), idx, qs1
            )
            ms8 = scan_net_ms(
                lambda h, x: ivf_topk(h, x, 10, probes=p), idx, qs8
            )
            print(
                f"{label} probes={p:3d}: recall@10={rec:.4f}  "
                f"q1_dev={ms1:.3f} ms  q8_dev={ms8:.3f} ms", flush=True,
            )

    ms1 = scan_net_ms(lambda h, x: masked_topk(h, x, 10), wd, qs1)
    ms8 = scan_net_ms(lambda h, x: masked_topk(h, x, 10), wd, qs8)
    print(f"exact twostage: q1_dev={ms1:.3f} ms  q8_dev={ms8:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
