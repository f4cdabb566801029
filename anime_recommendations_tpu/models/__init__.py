from anime_recommendations_tpu.models.two_tower import (
    TwoTowerParams,
    BNState,
    init_params,
    init_bn_state,
    forward,
    predict,
    loss_and_metrics,
    normalized_tables,
)

__all__ = [
    "TwoTowerParams",
    "BNState",
    "init_params",
    "init_bn_state",
    "forward",
    "predict",
    "loss_and_metrics",
    "normalized_tables",
]
