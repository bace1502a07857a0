from ogmm_tpu.train.state import TrainState, create_train_state, make_optimizer
from ogmm_tpu.train.trainer import Trainer, make_eval_step, make_train_step
from ogmm_tpu.train.checkpoint import CheckpointManager

__all__ = ["TrainState", "create_train_state", "make_optimizer", "Trainer",
           "make_eval_step", "make_train_step", "CheckpointManager"]
