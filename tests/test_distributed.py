"""Multi-process runtime test: 2 OS processes, one SPMD train step.

Exercises the actual multi-host code path (parallel/distributed.py):
jax.distributed.initialize over a gRPC coordinator, a global mesh spanning
both processes' devices, host-local batch feeding via host_batch_slice +
make_array_from_process_local_data, and a ShardedTrainStep whose collectives
cross the process boundary. The reference's equivalent surface is
TPUClusterResolver.connect() + TPUStrategy training
(/root/reference/neural_network/neural_network.py:142-144).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(n_procs: int, local_devices: int, extra: list[str]) -> list[dict]:
    port = _free_port()
    procs = []
    for pid in range(n_procs):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES=str(n_procs),
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "anime_recommendations_tpu.parallel.distributed",
                    "--worker", "--cpu-devices", str(local_devices), *extra,
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


@pytest.mark.parametrize("extra", [[], ["--optimizer", "lazy_adam"]],
                         ids=["adam", "lazy_adam"])
def test_two_process_sharded_step(extra):
    outs = _launch(2, local_devices=2, extra=extra)
    assert all(o["n_processes"] == 2 for o in outs)
    assert all(o["devices"] == 4 for o in outs)
    # The loss is psum'd over the whole mesh: every process must report the
    # same global value, and it must be finite.
    losses = [o["loss"] for o in outs]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert 0.0 < losses[0] < 10.0


def test_two_process_model_axis():
    # 2x2 mesh: the model axis also spans processes, so the all-to-all row
    # exchange itself crosses the process boundary.
    outs = _launch(2, local_devices=2, extra=["--data-axis", "2",
                                              "--model-axis", "2"])
    losses = [o["loss"] for o in outs]
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert 0.0 < losses[0] < 10.0


def test_two_process_full_fit_matches_single_process(tmp_path):
    """A FULL ShardedTrainer.fit under the 2-process runtime (VERDICT r3
    ask 4): device epoch scan with precomputed exchange plans, on-mesh
    holdout eval, owner-side fused Adam, best-checkpoint Orbax saves, and
    a same-mesh RESUME — vs the reference's complete model.fit under
    TPUStrategy (neural_network.py:174-217).

    Assertions: (a) both processes report the identical loss curve (all
    metrics are mesh-psum'd); (b) the curve matches a SINGLE-process run
    of the same spec on the same mesh size (the process topology must be
    math-invisible); (c) the fitted user table allgathers to the same
    fingerprint everywhere; (d) a resume run restores the checkpoint and
    continues rather than restarting."""
    ck = str(tmp_path / "ck")
    fit_args = ["--fit", "--epochs", "3", "--optimizer", "fused_adam",
                "--data-axis", "2", "--model-axis", "2",
                "--checkpoint-dir", ck]
    outs = _launch(2, local_devices=2, extra=fit_args)
    assert all(o["n_processes"] == 2 and o["devices"] == 4 for o in outs)
    assert outs[0]["loss"] == outs[1]["loss"]
    assert outs[0]["val_loss"] == outs[1]["val_loss"]
    assert outs[0]["user_emb_absum"] == pytest.approx(
        outs[1]["user_emb_absum"], rel=1e-6
    )
    assert len(outs[0]["loss"]) == 3
    assert outs[0]["loss"][-1] < outs[0]["loss"][0]  # it actually trained

    # Single-process run, same mesh size (1 proc x 4 devices): identical
    # math — the loss curve must match the 2-process run closely.
    solo = _launch(1, local_devices=4, extra=[
        "--fit", "--epochs", "3", "--optimizer", "fused_adam",
        "--data-axis", "2", "--model-axis", "2",
    ])[0]
    for a, b in zip(solo["loss"], outs[0]["loss"]):
        assert a == pytest.approx(b, rel=2e-4)
    for a, b in zip(solo["val_loss"], outs[0]["val_loss"]):
        assert a == pytest.approx(b, rel=2e-4)

    # Resume from the 2-process run's checkpoint on the same mesh: the
    # restored state must let the fit CONTINUE (fewer fresh epochs, and
    # the first resumed loss should start near where training left off,
    # not back at the cold-start loss).
    res = _launch(2, local_devices=2, extra=fit_args + [
        "--resume", "--epochs", "4",
    ])
    assert res[0]["loss"] == res[1]["loss"]
    assert len(res[0]["loss"]) < 4  # resumed past epoch 0
    assert res[0]["loss"][0] < outs[0]["loss"][0]
