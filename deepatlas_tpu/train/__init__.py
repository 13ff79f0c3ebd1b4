"""Training: experiments, jitted steps, schedules, checkpointing."""
from .base import BaseExperiment
from .checkpoint import initialize_from, load_checkpoint, save_checkpoint
from .schedules import (ConstLR, LRScheduler, MultiStepLR, ReduceLROnPlateau,
                        make_scheduler)
from .segmentation import SegmentationExperiment
from .steps import (TrainState, make_optimizer, make_seg_eval_step,
                    make_seg_train_step, set_learning_rate)

__all__ = [
    "BaseExperiment", "SegmentationExperiment", "TrainState",
    "make_optimizer", "make_seg_train_step", "make_seg_eval_step",
    "set_learning_rate", "save_checkpoint", "load_checkpoint",
    "initialize_from", "make_scheduler", "LRScheduler", "ConstLR",
    "MultiStepLR", "ReduceLROnPlateau",
]

from .registration import RegistrationExperiment  # noqa: E402
from .deepatlas import DeepAtlasExperiment  # noqa: E402
from .reg_steps import (make_reg_train_step, make_reg_eval_step,  # noqa: E402
                        make_joint_reg_step, make_joint_seg_step)

from .inference import (make_tile_predictor, sliding_window_predict,  # noqa: E402
                        evaluate_sliding_window)

__all__ += ["RegistrationExperiment", "DeepAtlasExperiment",
            "make_reg_train_step", "make_reg_eval_step",
            "make_joint_reg_step", "make_joint_seg_step",
            "make_tile_predictor", "sliding_window_predict",
            "evaluate_sliding_window"]
