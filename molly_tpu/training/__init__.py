from .trainer import (
    TrainConfig,
    TrainState,
    attach_lora,
    init_train_state,
    make_offloaded_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    offload_opt_state,
    trainable_mask,
)
from .checkpoint import (
    export_adapter,
    load_adapter,
    restore_train_state,
    save_train_state,
)
