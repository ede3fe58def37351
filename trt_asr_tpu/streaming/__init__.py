from trt_asr_tpu.streaming.schedule import ChunkSpec, ChunkScheduler, build_schedule  # noqa: F401
