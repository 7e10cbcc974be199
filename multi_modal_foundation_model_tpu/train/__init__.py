from .checkpoint import (load_checkpoint_meta, restore_checkpoint,
                         save_checkpoint)
from .logging import MetricLogger
from .multisession import MultiSessionTrainer, build_multisession_loaders
from .schedule import OptimizerConfig, make_optimizer, one_cycle_schedule
from .trainer import (BaselineTrainer, MultiModalTrainer, TrainerConfig,
                      TrainState, make_baseline_trainer,
                      make_multimodal_trainer)

__all__ = [
    "BaselineTrainer",
    "MetricLogger",
    "MultiModalTrainer",
    "MultiSessionTrainer",
    "build_multisession_loaders",
    "OptimizerConfig",
    "TrainState",
    "TrainerConfig",
    "load_checkpoint_meta",
    "make_baseline_trainer",
    "make_multimodal_trainer",
    "make_optimizer",
    "one_cycle_schedule",
    "restore_checkpoint",
    "save_checkpoint",
]
