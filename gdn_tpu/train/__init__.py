from gdn_tpu.train.state import create_optimizer, create_state, TrainState
from gdn_tpu.train.steps import (
    make_stage1_step,
    make_stage2_step,
    make_eval_forward,
)
