"""Unbuffered timestamped stage markers for hang diagnosis.

Reference behavior: PARAKEET_DEBUG_STAGE_MARKERS=1 emits stderr markers at
every pipeline stage (parakeet_trt.cpp:324-383). Enabled via
RuntimeConfig.stage_markers (TRT_ASR_STAGE_MARKERS / the PARAKEET alias).
"""

from __future__ import annotations

import sys
import time

_T0 = time.monotonic()


def stage_marker(rt, msg: str, force: bool = False) -> None:
    if force or (rt is not None and rt.stage_markers):
        print(f"[stage +{time.monotonic() - _T0:10.3f}s] {msg}", file=sys.stderr, flush=True)
