#!/usr/bin/env python3
"""Measure the serialized-engine call overhead at full size on the real
chip: steady-chunk steps through the live jit (donated state) vs the
deserialized StableHLO artifact (jax.export .call, no donation),
interleaved in ONE process (the only tunnel-robust comparison —
docs/DEBUGGING.md).

    python tools/perf/engine_overhead_tpu.py \
        --engines artifacts/engines/full_tpu --steps 20 \
        --out artifacts/perf/engine_overhead_tpu.json

Context: tiny/CPU measured ~4x per-step overhead (host-side costs); the
claim to check is that at full size on TPU the absolute overhead is
amortized by real device work.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="artifacts/engines/full_tpu")
    ap.add_argument("--config", default="full", choices=["tiny", "full"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.runtime.engine import EngineSet, program_key
    from trt_asr_tpu.streaming.session import StreamingSession, _session_step

    cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
    model = ParakeetTDT.random(cfg, seed=0)
    es = EngineSet.load(args.engines)
    print(f"device: {jax.devices()[0].device_kind}; engines: {len(es)}")

    live = StreamingSession(model)
    served = StreamingSession(model, engines=es)
    rng = np.random.default_rng(0)
    shift = cfg.shift_size_frames[1]
    # prime both sessions past chunk 0 and compile the steady programs
    warm = (0.3 * rng.standard_normal((cfg.chunk_size_frames[0] + shift + 1,
                                       cfg.feat_in))).astype(np.float32)
    for s in (live, served):
        s.push_features(warm.copy())
    # interleaved timed rounds: vary input per step (tunnel memoization),
    # fence with np.asarray via the session's own token fetch
    t_live, t_eng = [], []
    for r in range(args.rounds):
        for label, sess, acc in (("live", live, t_live),
                                 ("engine", served, t_eng)):
            for i in range(args.steps):
                feats = (0.3 * rng.standard_normal((shift, cfg.feat_in))
                         ).astype(np.float32)
                t0 = time.perf_counter()
                sess.push_features(feats)
                acc.append((time.perf_counter() - t0) * 1e3)
        print(f"round {r}: live p50 {np.percentile(t_live, 50):.2f} ms | "
              f"engine p50 {np.percentile(t_eng, 50):.2f} ms", flush=True)
    assert served.engine_misses == 0 and served.engine_hits > 0, \
        (served.engine_hits, served.engine_misses)
    res = {
        "device": str(jax.devices()[0].device_kind),
        "config": args.config,
        "steps_per_arm": len(t_live),
        "live_ms": {"p50": float(np.percentile(t_live, 50)),
                    "p90": float(np.percentile(t_live, 90))},
        "engine_ms": {"p50": float(np.percentile(t_eng, 50)),
                      "p90": float(np.percentile(t_eng, 90))},
        "overhead_x_p50": round(float(np.percentile(t_eng, 50)
                                      / np.percentile(t_live, 50)), 3),
        "engine_hits": served.engine_hits,
    }
    print(json.dumps(res))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
