from trt_asr_tpu.train.tdt_loss import tdt_loss  # noqa: F401
from trt_asr_tpu.train.train_step import make_train_step, training_forward  # noqa: F401
