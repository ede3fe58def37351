from trt_asr_tpu.frontend.logmel import (  # noqa: F401
    LogMelFrontend,
    StreamingLogMel,
    hann_window,
    mel_filterbank,
)
from trt_asr_tpu.frontend.normalize import (  # noqa: F401
    apply_per_feature_norm,
    compute_per_feature_stats,
)
