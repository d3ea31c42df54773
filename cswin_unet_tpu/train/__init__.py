from .trainer import trainer_synapse, make_train_step, poly_lr_schedule
from .tpgm import TPGMTrainer, init_constraints, project, ratio_stats
from .surgical import (
    SurgicalOptimizer,
    get_lr_weights,
    normalize_weights,
    surgical_layer_names,
)
from .continual import (
    PositiveSamplingDataset,
    get_stage_info,
    map_new_dataset_labels,
    trainer_continual_surgical_tpgm,
)

__all__ = [
    "trainer_synapse",
    "make_train_step",
    "poly_lr_schedule",
    "TPGMTrainer",
    "init_constraints",
    "project",
    "ratio_stats",
    "SurgicalOptimizer",
    "get_lr_weights",
    "normalize_weights",
    "surgical_layer_names",
    "PositiveSamplingDataset",
    "get_stage_info",
    "map_new_dataset_labels",
    "trainer_continual_surgical_tpgm",
]
