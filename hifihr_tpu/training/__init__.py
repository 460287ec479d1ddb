from hifihr_tpu.training.train_state import TrainState, create_train_state, make_lr_schedule
from hifihr_tpu.training.steps import make_train_step, make_eval_step
