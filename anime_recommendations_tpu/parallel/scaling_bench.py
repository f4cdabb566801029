"""Scaling-efficiency benchmark harness.

Measures sustained training examples/s for a set of mesh shapes and
reports parallel efficiency relative to the smallest shape
(BASELINE.md target: >=80% examples/s/chip efficiency 1 chip -> N).

On a real pod slice run one process per host with
``jax.distributed.initialize()`` and the full device set; in this
single-chip/CI environment the same harness runs against virtual CPU
devices (JAX_PLATFORMS=cpu + jax_num_cpu_devices), which validates the
sharding/collective structure but NOT real ICI bandwidth.

Usage:
    python -m anime_recommendations_tpu.parallel.scaling_bench \
        --meshes 1x1 2x1 4x1 4x2 --steps 30 --batch 8192
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_mesh(
    data_axis: int,
    model_axis: int,
    n_users: int,
    n_anime: int,
    embedding_size: int,
    batch: int,
    steps: int,
    seed: int = 0,
) -> dict:
    import jax
    import jax.numpy as jnp

    from anime_recommendations_tpu.parallel.mesh import make_mesh, pad_rows_for_shards
    from anime_recommendations_tpu.parallel.sharded_train import (
        ShardedTrainStep,
        place_state,
    )
    from anime_recommendations_tpu.train.trainer import init_train_state

    n_dev = data_axis * model_axis
    mesh = make_mesh(data_axis, model_axis, devices=jax.devices()[:n_dev])
    step = ShardedTrainStep(mesh, l2_reg_factor=1e-4)
    n_users_p = pad_rows_for_shards(n_users, model_axis)
    state = place_state(
        init_train_state(jax.random.PRNGKey(seed), n_users_p, n_anime,
                         embedding_size),
        mesh,
    )
    rng = np.random.default_rng(seed)
    n_batches = 4
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

    def run(state, n):
        loss = None
        for i in range(n):
            u, a, r, w = batches[i % n_batches]
            state, loss, _ = step.train_step(state, u, a, r, w, lr)
        return state, loss

    state, loss = run(state, 3)  # compile + warm
    float(loss)
    t0 = time.perf_counter()
    state, loss = run(state, steps)
    float(loss)
    dt = time.perf_counter() - t0
    return {
        "mesh": f"{data_axis}x{model_axis}",
        "devices": n_dev,
        "examples_per_sec": steps * batch / dt,
        "step_ms": dt / steps * 1e3,
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--meshes", nargs="+", default=["1x1", "2x1", "4x1", "4x2"])
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--users", type=int, default=91_641)
    parser.add_argument("--anime", type=int, default=17_560)
    parser.add_argument("--emb", type=int, default=128)
    args = parser.parse_args(argv)

    results = []
    for shape in args.meshes:
        d, m = (int(x) for x in shape.split("x"))
        res = measure_mesh(
            d, m, args.users, args.anime, args.emb, args.batch, args.steps
        )
        results.append(res)
        print(json.dumps(res), flush=True)

    base = results[0]
    for res in results:
        scale = res["devices"] / base["devices"]
        ideal = base["examples_per_sec"] * scale
        res["efficiency_vs_first"] = res["examples_per_sec"] / ideal
    print(
        json.dumps(
            {
                "summary": [
                    {
                        "mesh": r["mesh"],
                        "examples_per_sec": round(r["examples_per_sec"]),
                        "efficiency": round(r["efficiency_vs_first"], 3),
                    }
                    for r in results
                ]
            }
        )
    )


if __name__ == "__main__":
    main()
