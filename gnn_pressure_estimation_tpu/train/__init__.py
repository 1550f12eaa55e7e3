from gnn_pressure_estimation_tpu.train.early_stopping import EarlyStopping
from gnn_pressure_estimation_tpu.train.autoclip import autoclip
from gnn_pressure_estimation_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from gnn_pressure_estimation_tpu.train.loop import TrainConfig, Trainer

__all__ = [
    "EarlyStopping",
    "autoclip",
    "save_checkpoint",
    "load_checkpoint",
    "TrainConfig",
    "Trainer",
]
