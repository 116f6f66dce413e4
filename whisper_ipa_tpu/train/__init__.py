from .checkpoints import (
    latest_checkpoint,
    restore_checkpoint,
    save_best_checkpoint,
    check_vocab_provenance,
    save_checkpoint,
)
from .logger import (
    TrainingLogger,
    console_step_line,
    get_hardware_info,
    save_training_config,
)
from .loss import compute_loss, eot_loss_mask, masked_cross_entropy
from .loop import train, validate
from .optimizer import (
    clip_by_per_tensor_norm,
    decoder_only_mask,
    make_optimizer,
)
from .step import (
    TrainState,
    create_train_state,
    create_train_state_zero1,
    make_zero1_step,
    train_chunk,
    train_step,
)

__all__ = [
    "TrainState",
    "TrainingLogger",
    "clip_by_per_tensor_norm",
    "compute_loss",
    "console_step_line",
    "create_train_state",
    "create_train_state_zero1",
    "decoder_only_mask",
    "make_zero1_step",
    "eot_loss_mask",
    "get_hardware_info",
    "latest_checkpoint",
    "make_optimizer",
    "masked_cross_entropy",
    "restore_checkpoint",
    "save_best_checkpoint",
    "check_vocab_provenance",
    "save_checkpoint",
    "save_training_config",
    "train",
    "train_chunk",
    "train_step",
    "validate",
]
