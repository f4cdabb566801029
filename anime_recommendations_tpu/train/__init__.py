from anime_recommendations_tpu.train.schedule import lr_for_epoch
from anime_recommendations_tpu.train.trainer import Trainer, TrainState, TrainResult

__all__ = ["lr_for_epoch", "Trainer", "TrainState", "TrainResult"]
