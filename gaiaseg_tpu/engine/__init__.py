from .checkpoint import (latest_checkpoint, load_checkpoint, save_checkpoint,
                         subnet_ckpt_name, update_latest)
from .evaluate import (cross_arch_evaluate, evaluate, make_eval_step,
                       population_eval_steps)
from .optim import build_lr_schedule, build_optimizer, scale_lr
from .train import (TrainState, create_train_state, make_multi_train_step,
                    make_train_step, train_segmentor)
from .inference import (Segmentor, inference_segmentor, init_segmentor,
                        show_result)
from .calibrate import calibrate_bn, reset_bn_stats

__all__ = [
    "TrainState", "create_train_state", "make_train_step",
    "make_multi_train_step", "train_segmentor",
    "evaluate", "cross_arch_evaluate", "make_eval_step",
    "population_eval_steps", "build_optimizer", "build_lr_schedule",
    "scale_lr", "save_checkpoint", "load_checkpoint", "latest_checkpoint",
    "update_latest", "subnet_ckpt_name", "Segmentor", "init_segmentor",
    "inference_segmentor", "show_result", "calibrate_bn", "reset_bn_stats",
]
