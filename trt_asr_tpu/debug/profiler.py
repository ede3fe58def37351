"""Device profiler capture (jax.profiler / XPlane) for the streaming hot path.

The reference profiles its pipeline with Nsight/TRT verbose timing wired
through env toggles (PARAKEET_DEBUG_* family, parakeet_trt.cpp:79-96 and
its async-instrumentation notes — SURVEY §5 tracing). The TPU-native
equivalent is an XPlane capture: set ``TRT_ASR_PROFILE_DIR`` and the
session records a jax.profiler trace of the first
``TRT_ASR_PROFILE_CHUNKS`` (default 20) chunk steps, then stops and writes
a TensorBoard-loadable profile (xplane.pb + trace.json.gz) under a
run-isolated directory. Works on CPU, TPU, and through the axon tunnel
(host-side timeline; device lanes appear when the backend exports them).

Usage:
    TRT_ASR_PROFILE_DIR=/tmp/prof python -m trt_asr_tpu.cli demo.wav ...
    tensorboard --logdir /tmp/prof   # or inspect trace.json.gz directly
"""

from __future__ import annotations

import os
import time
from typing import Optional


class ChunkProfiler:
    """Bounded profiler session: starts on first chunk, stops after N."""

    def __init__(self, out_dir: str, max_chunks: int = 20):
        self.out_dir = os.path.join(out_dir, f"run_{int(time.time())}")
        self.max_chunks = max_chunks
        self._count = 0
        self._active = False
        self._done = False

    def chunk_start(self) -> None:
        if self._done or self._active:
            return
        import jax

        os.makedirs(self.out_dir, exist_ok=True)
        jax.profiler.start_trace(self.out_dir)
        self._active = True

    def chunk_end(self) -> None:
        if not self._active:
            return
        self._count += 1
        if self._count >= self.max_chunks:
            self.stop()

    def stop(self) -> None:
        if not self._active:
            return
        import jax

        jax.profiler.stop_trace()
        self._active = False
        self._done = True


def maybe_profiler(rt) -> Optional[ChunkProfiler]:
    """ChunkProfiler when RuntimeConfig.profile_dir is set, else None."""
    if not getattr(rt, "profile_dir", ""):
        return None
    return ChunkProfiler(rt.profile_dir, rt.profile_chunks)
