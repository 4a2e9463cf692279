from cgs_tpu.train.steps import (  # noqa: F401
    TrainState, make_critic_step, make_masker_step, make_optimizer,
)
