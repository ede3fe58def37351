"""Per-chunk state snapshot dumps for cross-runtime comparison.

Reference equivalent: PARAKEET_TDT_SNAPSHOT_DIR (parakeet_trt.cpp:2341-2390,
3518-3594) dumping enc slice / predictor g / duration logits / caches as raw
f32 + meta JSON. Ours dumps the full streaming state per chunk (encoder
cache summary + decode state) — the exact tensors a parity harness diffs
against another backend's run.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


def maybe_snapshot_chunk(rt, chunk_idx: int, enc_state=None, dec_state=None,
                         tokens: Optional[List[int]] = None) -> Optional[str]:
    if rt is None or not rt.snapshot_dir:
        return None
    d = os.path.join(rt.snapshot_dir, f"chunk_{chunk_idx:05d}")
    os.makedirs(d, exist_ok=True)
    meta = {"chunk_idx": chunk_idx, "tokens": list(tokens or [])}
    if enc_state is not None:
        att = np.asarray(enc_state.att_cache, np.float32)
        tc = np.asarray(enc_state.time_cache, np.float32)
        att.tofile(os.path.join(d, "att_cache.f32"))
        tc.tofile(os.path.join(d, "time_cache.f32"))
        meta["att_cache_shape"] = list(att.shape)
        meta["time_cache_shape"] = list(tc.shape)
        meta["cache_len"] = np.asarray(enc_state.cache_len).tolist()
    if dec_state is not None:
        g = np.asarray(dec_state.g, np.float32)
        h = np.asarray(dec_state.h, np.float32)
        c = np.asarray(dec_state.c, np.float32)
        g.tofile(os.path.join(d, "pred_g.f32"))
        h.tofile(os.path.join(d, "pred_h.f32"))
        c.tofile(os.path.join(d, "pred_c.f32"))
        meta["g_shape"] = list(g.shape)
        meta["h_shape"] = list(h.shape)
        meta["y_id"] = np.asarray(dec_state.y_id).tolist()
        meta["time_carry"] = np.asarray(dec_state.time_carry).tolist()
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return d
