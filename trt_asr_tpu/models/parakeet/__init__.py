from trt_asr_tpu.models.parakeet.params import init_params, cast_params_for_compute  # noqa: F401
from trt_asr_tpu.models.parakeet.encoder import (  # noqa: F401
    EncoderState,
    encode,
    init_encoder_state,
    offline_encode,
    precompute_pos_proj,
)
from trt_asr_tpu.models.parakeet.predictor import predictor_step, predictor_sequence  # noqa: F401
from trt_asr_tpu.models.parakeet.joint import joint_apply, joint_single_step  # noqa: F401
