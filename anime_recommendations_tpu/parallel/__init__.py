from anime_recommendations_tpu.parallel.mesh import make_mesh, mesh_shape_for
from anime_recommendations_tpu.parallel.sharded_train import (
    ShardedTrainStep,
    state_shardings,
)

__all__ = ["make_mesh", "mesh_shape_for", "ShardedTrainStep", "state_shardings"]
