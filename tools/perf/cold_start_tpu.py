#!/usr/bin/env python3
"""Measure serving cold start on the real TPU: first-chunk wall time of a
fresh process with vs without the persistent XLA compilation cache
(runtime/engine.py apply_compile_cache — the reference's load-.engine
cold-start story, cpp/src/parakeet_trt.cpp:1720-1738: deserialize in ~1 s
vs rebuild in minutes).

Runs each arm in a SUBPROCESS (the cache is only exercised by a fresh
process) and writes one JSON artifact:

    python tools/perf/cold_start_tpu.py --config full \
        --out artifacts/perf/cold_start_tpu.json

Arms: nocache (baseline trace+compile), cache-populate (first cached run,
same cost + write), cache-hit (the serving cold start).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = __file__.rsplit("/tools/", 1)[0]

CHILD = r"""
import json, os, sys, time
t_import = time.perf_counter()
import jax
import numpy as np
from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import StreamingSession

cfg = ModelConfig.tiny() if sys.argv[1] == "tiny" else ModelConfig()
model = ParakeetTDT.random(cfg, seed=0)
sess = StreamingSession(model)
rng = np.random.default_rng(0)
t0 = time.perf_counter()
# one steady program compile + execute: push enough for chunk0 + 1 steady
frames = cfg.chunk_size_frames[0] + cfg.shift_size_frames[1] + cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
feats = (0.5 * rng.standard_normal((frames, cfg.feat_in))).astype(np.float32)
sess.push_features(feats)
t_chunks = time.perf_counter() - t0
t1 = time.perf_counter()
sess.finalize()
t_final = time.perf_counter() - t1
print(json.dumps({"first_chunks_s": round(t_chunks, 3),
                  "finalize_s": round(t_final, 3),
                  "total_s": round(time.perf_counter() - t_import, 3),
                  "platform": jax.devices()[0].platform}))
"""


def run_arm(config: str, cache_dir: str | None, timeout_s: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
    env.pop("TRT_ASR_COMPILE_CACHE", None)
    if cache_dir:
        env["TRT_ASR_COMPILE_CACHE"] = cache_dir
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, "-c", CHILD, config],
                       capture_output=True, text=True, env=env,
                       timeout=timeout_s)
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        return {"error": p.stderr[-800:], "wall_s": round(wall, 1)}
    out = json.loads(p.stdout.strip().splitlines()[-1])
    out["proc_wall_s"] = round(wall, 1)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="full", choices=["tiny", "full"])
    ap.add_argument("--out", default="")
    ap.add_argument("--cache-dir", default="",
                    help="reuse an existing populated cache (skips the populate arm)")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    cache = args.cache_dir or tempfile.mkdtemp(prefix="xla_cold_")
    res = {"config": args.config, "cache_dir": cache, "arms": {}}
    arms = [("nocache", None)]
    if not args.cache_dir:
        arms.append(("cache_populate", cache))
    arms.append(("cache_hit", cache))
    for name, cd in arms:
        print(f"[{time.strftime('%H:%M:%S')}] arm {name} ...", flush=True)
        res["arms"][name] = run_arm(args.config, cd, args.timeout)
        print(f"  -> {res['arms'][name]}", flush=True)
    nc = res["arms"].get("nocache", {}).get("first_chunks_s")
    ch = res["arms"].get("cache_hit", {}).get("first_chunks_s")
    if nc and ch:
        res["speedup_first_chunks"] = round(nc / ch, 2)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
