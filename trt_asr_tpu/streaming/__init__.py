from trt_asr_tpu.streaming.schedule import (  # noqa: F401
    ChunkScheduler,
    ChunkSpec,
    StreamingRegime,
    build_schedule,
    build_schedule_n,
    predict_bookkeeping,
)
