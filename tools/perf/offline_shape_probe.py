#!/usr/bin/env python3
"""Shape probe for the 30 s offline plateau (VERDICT r3 #2, step 2).

The r4 ablation (offline_att_ablation.py) showed the plateau is NOT the
attention core: removing scores+bias+softmax+context entirely leaves the
274 ms unchanged at 30 s B=32. The remaining suspect set is shape/layout:
per-TOKEN cost is ~1.7x worse at (T=375, B=32) than at (T=125, B=128)
despite near-equal token counts and identical per-token FLOPs. This tool
times the full offline encode over a (seconds, batch) grid interleaved in
ONE process, reporting us/token — if T=384 (a multiple of 128) is
significantly cheaper per token than T=375, the plateau is an XLA tile-
padding artifact and the fix is length bucketing to T%128==0.

    python tools/perf/offline_shape_probe.py \
        --grid 30:32,30.72:32,10:32,10.24:32,10:128,30.72:16 [--rounds 3]
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
    ap.add_argument("--grid", default="30:32,30.72:32,10:32,10.24:32,10:128")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--out", default="artifacts/perf/offline_shape_probe.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet import init_params, offline_encode
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute

    cfg = ModelConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    t0 = time.time()
    params = init_params(cfg, seed=0)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.dtype == "bf16":
        params = cast_params_for_compute(params, jnp.bfloat16)
    params = jax.device_put(params)
    print(f"params init+put: {time.time()-t0:.1f}s", flush=True)

    arms = []
    for spec in args.grid.split(","):
        sec, b = spec.split(":")
        arms.append((float(sec), int(b)))

    rng = np.random.default_rng(0)
    jitted = {}
    inputs = {}
    meta = {}
    for sec, b in arms:
        frames = int(sec * 100)
        t_sub = frames
        for _ in range(cfg.stride_stages):
            t_sub = (t_sub - 1) // 2 + 1
        feats = jnp.asarray(rng.standard_normal(
            (b, frames, cfg.feat_in)).astype(np.float32))
        lens = jnp.full((b,), frames, jnp.int32)

        def fn(p, f, lens=lens):
            enc, out_len = offline_encode(p, cfg, f, lens,
                                          compute_dtype=dtype)
            return enc[:, :1, :64], out_len
        j = jax.jit(fn)
        t0 = time.time()
        out = j(params, feats)
        _ = np.asarray(out[0])
        print(f"{sec}s B={b} (T={t_sub}): compile+first {time.time()-t0:.1f}s",
              flush=True)
        key = f"{sec}s_b{b}"
        jitted[key] = j
        inputs[key] = feats
        meta[key] = {"T": t_sub, "tokens": b * t_sub, "batch": b,
                     "seconds": sec}

    results = {k: [] for k in jitted}
    for r in range(args.rounds):
        line = []
        for k, j in jitted.items():
            f = inputs[k] * (1 + 0.01 * (r + 1))
            t0 = time.perf_counter()
            out = j(params, f)
            _ = np.asarray(out[0])
            ms = (time.perf_counter() - t0) * 1e3
            results[k].append(ms)
            line.append(f"{k} {ms:.0f}")
        print(f"round {r}: " + "  ".join(line), flush=True)

    summary = {"device": dev.device_kind, "dtype": args.dtype, "arms": {}}
    for k, v in results.items():
        best = min(v)
        summary["arms"][k] = {
            **meta[k], "ms": round(best, 1),
            "us_per_token": round(best * 1e3 / meta[k]["tokens"], 2)}
        print(f"{k}: {best:.1f} ms, {summary['arms'][k]['us_per_token']} "
              f"us/token (T={meta[k]['T']})", flush=True)
    print(json.dumps(summary["arms"]))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fj:
            json.dump(summary, fj, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
