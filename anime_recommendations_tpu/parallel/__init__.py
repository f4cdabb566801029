from anime_recommendations_tpu.parallel.mesh import make_mesh, mesh_shape_for
from anime_recommendations_tpu.parallel.sharded_train import (
    ShardedTrainStep,
    state_shardings,
)
from anime_recommendations_tpu.parallel.trainer import ShardedTrainer

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "ShardedTrainStep",
    "state_shardings",
    "ShardedTrainer",
]
