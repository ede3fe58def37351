from trt_asr_tpu.train.tdt_loss import tdt_loss  # noqa: F401
from trt_asr_tpu.train.augment import spec_augment  # noqa: F401
from trt_asr_tpu.train.train_step import (  # noqa: F401
    make_optimizer,
    make_train_step,
    training_forward,
)
