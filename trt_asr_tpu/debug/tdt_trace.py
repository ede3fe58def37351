"""Production-decode step trace (reference PARAKEET_DEBUG_TDT_STEPS).

The reference's primary decode-debugging method is first-divergence on
hot-path NDJSON step records (cpp/src/parakeet_trt.cpp:667-687,3429-3449,
3715-3751). Its device loop here is a fused ``lax.while_loop``; with
``RuntimeConfig.debug_tdt_steps`` the loop carries a bounded int32 record
buffer (decode/tdt_greedy.py trace=True) that this module converts to the
same JSONL schema ``host_decode.py`` emits, so
``tools/parity/compare_tdt_trace.py`` can first-divergence the production
loop against the host/torch oracle. Unlike the reference's hardcoded debug
path (a documented wart), the output path is configurable
(``TRT_ASR_TDT_TRACE_PATH``).
"""

from __future__ import annotations

import json
from typing import Dict, List

import numpy as np

# column order produced by tdt_greedy_decode_chunk(trace=True)
COLUMNS = ("time_idx", "u", "y_id", "best_tok", "duration", "advance", "is_blank")


def records_from_buffer(buf: np.ndarray, n_steps: int) -> List[Dict]:
    """Decode the device int32 record buffer into step dicts (host schema)."""
    buf = np.asarray(buf)
    out: List[Dict] = []
    for row in buf[: int(n_steps)]:
        rec = {"type": "step"}
        rec.update({k: int(v) for k, v in zip(COLUMNS, row)})
        rec["is_blank"] = bool(rec["is_blank"])
        # host_decode convention: `duration` is the raw duration-head value,
        # `advance` is post blank+dur0 clamp; flag the clamp explicitly
        rec["blank_dur0_clamped"] = bool(
            rec["is_blank"] and rec["duration"] == 0 and rec["advance"] == 1)
        out.append(rec)
    return out


def write_ndjson(path: str, steps: List[Dict], *, blank_id: int,
                 emitted: int, extra_meta: Dict | None = None) -> None:
    meta = {"type": "meta", "source": "device_while_loop",
            "blank_id": blank_id, "emitted": emitted}
    if extra_meta:
        meta.update(extra_meta)
    with open(path, "w") as f:
        f.write(json.dumps(meta) + "\n")
        for rec in steps:
            f.write(json.dumps(rec) + "\n")
