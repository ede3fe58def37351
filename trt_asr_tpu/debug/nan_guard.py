"""NaN/Inf guards — numeric sanitizers.

Reference behavior: sampled device-tensor scans with context-rich alerts and
optional abort (nan_guard_device, parakeet_trt.cpp:910-1013;
PARAKEET_NAN_GUARD_ALWAYS / _HALT). On TPU a full scan is one jnp.isfinite
reduction; sampling cadence (first N then 1-in-100) is kept for hot paths.
"""

from __future__ import annotations

import sys
from typing import Optional

import numpy as np


class NanGuardError(RuntimeError):
    pass


_counters: dict = {}


def check_finite(x, name: str, halt: bool = False, sample: bool = False,
                 first_n: int = 10, every: int = 100) -> bool:
    """Returns True if checked and finite. Sampling mirrors the reference
    cadence: always check the first `first_n` calls per site, then 1-in-`every`."""
    if sample:
        c = _counters.get(name, 0)
        _counters[name] = c + 1
        if c >= first_n and (c % every) != 0:
            return True
    arr = np.asarray(x)
    bad = int(np.size(arr) - np.isfinite(arr).sum())
    if bad:
        msg = f"nan_guard: {name} has {bad} non-finite values (shape {arr.shape})"
        print(msg, file=sys.stderr, flush=True)
        if halt:
            raise NanGuardError(msg)
        return False
    return True


def scrub_logits(logits: np.ndarray, fill: float = -100.0) -> np.ndarray:
    """NaN -> -100 scrub, matching the reference's inline joint-logits scrub
    (parakeet_trt.cpp:2971,3084)."""
    return np.where(np.isfinite(logits), logits, fill)
