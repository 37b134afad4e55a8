from .train_step import TrainConfig, glass_train_forward
from .trainer import Trainer
from .checkpoint import (
    load_torch_checkpoint,
    convert_torch_state_dict,
    save_checkpoint,
    load_checkpoint,
)
from .optimizer import build_optimizer, warmup_multistep_schedule
