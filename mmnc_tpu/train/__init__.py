from .state import TrainState, create_train_state
from .step import make_train_step, make_eval_step, make_multi_train_step
