from .checkpoint import CheckpointManager, restore_variables, save_variables
from .train_state import (
    TrainState,
    cosine_lr_schedule,
    create_train_state,
    detection_eval_step,
    detection_train_step,
    make_grouped_optimizer,
    make_optimizer,
    make_train_step,
    param_group_labels,
)
