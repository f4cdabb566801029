"""Async checkpointing via Orbax.

TPU-native equivalent of the reference's best-only, async-on-TPU Keras
checkpointing (ModelCheckpoint neural_network.py:188-196 +
tf.train.CheckpointOptions(enable_async=True) :178): saves are dispatched
asynchronously so the accelerator never waits on disk, and only the best
state per run is retained (max_to_keep=1 by default, matching
save_best_only=True).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp


class AsyncCheckpointer:
    def __init__(self, directory: str | Path, max_to_keep: int = 1):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {self._dir}")
        if template is not None:
            return self._mngr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mngr.restore(step)

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
