from .state import TrainState, create_train_state, build_optimizer
from .steps import make_train_step, make_eval_step, make_multi_train_step
from .checkpoint import CheckpointManager, restore_ema_params
