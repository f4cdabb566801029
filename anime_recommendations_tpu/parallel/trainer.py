"""Multi-chip trainer: the single-chip epoch loop over SPMD steps.

Drop-in replacement for train.Trainer on a ('data','model') mesh. Handles:
  * user-table row padding to a model-shard multiple (zero rows are inert
    under the L2 term — parallel/mesh.pad_table)
  * state placement with NamedShardings
  * global batches sharded over 'data' (batch_size must divide evenly)

The reference scaled lr/batch by num_replicas_in_sync but then never used
the scaled values (neural_network.py:176-177 vs :213 — dead code, SURVEY.md
§3.2); here scaling is explicit and opt-in via scale_lr_by_data_shards.
"""

from __future__ import annotations

from dataclasses import dataclass

from anime_recommendations_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    pad_rows_for_shards,
)
from anime_recommendations_tpu.parallel.sharded_train import (
    ShardedTrainStep,
    build_epoch_fn,
    place_state,
)
from anime_recommendations_tpu.train.trainer import (
    Trainer,
    TrainState,
    init_train_state,
)


@dataclass
class ShardedTrainer(Trainer):
    data_axis: int = -1
    model_axis: int = 1
    shard_anime: bool = False
    scale_lr_by_data_shards: bool = False

    def __post_init__(self):
        super().__post_init__()  # optimizer validation
        if self.optimizer == "lazy_adam":
            raise ValueError(
                "lazy_adam is single-chip-only for now; the sharded path "
                "uses dense Adam (see train/lazy.py)"
            )
        self.mesh = make_mesh(self.data_axis, self.model_axis)
        self._n_model = self.mesh.shape[MODEL_AXIS]
        self._n_data = self.mesh.shape["data"]
        if self.batch_size % self._n_data:
            raise ValueError(
                f"batch_size {self.batch_size} must divide by data shards "
                f"{self._n_data}"
            )
        self._step = ShardedTrainStep(
            self.mesh,
            l2_reg_factor=self.l2_reg_factor,
            shard_anime=self.shard_anime,
        )

    # ---- backend hooks --------------------------------------------------------

    def _init_state(self, rng, n_users: int, n_anime: int) -> TrainState:
        n_users_p = pad_rows_for_shards(n_users, self._n_model)
        n_anime_p = (
            pad_rows_for_shards(n_anime, self._n_model)
            if self.shard_anime else n_anime
        )
        state = init_train_state(rng, n_users_p, n_anime_p, self.embedding_size)
        return place_state(state, self.mesh, self.shard_anime)

    def _train_step(self, state, batch, lr):
        if self.scale_lr_by_data_shards:
            lr = lr * self._n_data
        return self._step.train_step(
            state, batch.users, batch.anime, batch.ratings, batch.weights, lr
        )

    def _eval_sums(self, params, bn_state, batch):
        return self._step.eval_sums(
            params, bn_state, batch.users, batch.anime, batch.ratings,
            batch.weights,
        )

    def _eval_batch_size(self, n_rows: int) -> int:
        size = min(self.batch_size, max(n_rows, self._n_data))
        return max(size - size % self._n_data, self._n_data)

    # ---- device-resident SPMD epoch (one launch per epoch) ---------------------

    def _stage_device(self, train, holdout):
        """Stage the epoch as [nb, B] arrays with B sharded over 'data'.

        Rows are host-shuffled once (seeded), fixing batch COMPOSITION for
        the run; per-epoch shuffling permutes batch order on device
        (sharded_train.build_epoch_fn). Re-mixing examples across sharded
        batches each epoch would pay cross-shard all-to-alls; with the
        seeded host shuffle each batch is already a uniform random sample.
        """
        import jax as _jax
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        bs = min(self.batch_size, max(len(train), 1))
        bs = max(bs - bs % self._n_data, self._n_data)
        n = len(train)
        nb = max(-(-n // bs), 1)
        pad = nb * bs - n
        order = (
            np.random.default_rng(self.seed).permutation(n)
            if self.shuffle_each_epoch else np.arange(n)
        )
        sh = NamedSharding(self.mesh, P(None, "data"))

        def put(x, dtype):
            return _jax.device_put(
                np.pad(x[order], (0, pad)).astype(dtype).reshape(nb, bs), sh
            )

        arrays = (
            put(train.users, np.int32),
            put(train.anime, np.int32),
            put(train.ratings, np.float32),
            _jax.device_put(
                np.pad(np.ones(n, np.float32), (0, pad)).reshape(nb, bs), sh
            ),
        )
        epoch_fn = build_epoch_fn(self._step, self.shuffle_each_epoch)
        return (arrays, epoch_fn, holdout)

    def _device_epoch(self, staged, state, epoch: int, lr):
        import jax as _jax
        import jax.numpy as jnp
        import numpy as np

        arrays, epoch_fn, holdout = staged
        if self.scale_lr_by_data_shards:
            lr = lr * self._n_data
        key = _jax.random.fold_in(_jax.random.PRNGKey(self.seed), epoch)
        state, losses, mses, wsums = epoch_fn(
            state, *arrays, key, jnp.float32(lr)
        )
        bw = np.asarray(wsums, np.float64)
        loss_sum = float(np.asarray(losses) @ bw)
        mse_sum = float(np.asarray(mses) @ bw)
        val_loss, val_mse = self.evaluate(state.params, state.bn_state, holdout)
        return state, loss_sum, mse_sum, float(bw.sum()), val_loss, val_mse
