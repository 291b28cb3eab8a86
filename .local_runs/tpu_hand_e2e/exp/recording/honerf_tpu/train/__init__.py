from honerf_tpu.train.checkpoints import (
    latest_checkpoint,
    load_checkpoint,
    load_torch_checkpoint,
    save_checkpoint,
)
from honerf_tpu.train.offline import (
    TrainHyper,
    init_train_state,
    make_obj_eval_render,
    make_obj_train_step,
    make_optimizer,
)
from honerf_tpu.train.schedule import make_lr_schedule, warmup_cosine_factor

__all__ = [
    "TrainHyper",
    "init_train_state",
    "latest_checkpoint",
    "load_checkpoint",
    "load_torch_checkpoint",
    "make_lr_schedule",
    "make_obj_eval_render",
    "make_obj_train_step",
    "make_optimizer",
    "save_checkpoint",
    "warmup_cosine_factor",
]
