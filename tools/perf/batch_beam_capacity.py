#!/usr/bin/env python3
"""Serving capacity of the BATCHED device beam vs lockstep greedy
(VERDICT r4 #3 done-bar: a measured streams/chip at beam=4, accuracy
mode, next to the greedy capacity row).

Interleaved arms in ONE process (tunnel-robust), chained varied inputs,
one host-fetch fence per N-step run, min over rounds:

  greedy  _batch_step           (the capacity_f32_b32.json program)
  beam    _batch_beam_step      (streaming/batch_engine.py: batched
          encoder + S lockstep device beams, beam=K)

Params generated on device (bench.py _device_init_params); the blank
bias sets the bench's ~1.5 tok/chunk emission profile.

    python tools/perf/batch_beam_capacity.py --batch 8 [--beam 4]
        [--steps 20] [--rounds 3] [--f32-precision high]
        [--out artifacts/perf/batch_beam_capacity.json]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--token-cap", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--blank-bias", type=float, default=1.5)
    ap.add_argument("--f32-precision", default="high",
                    choices=["high", "highest"],
                    help="capacity mode: high is the B>=32 serving rung "
                         "(PERFNOTES B=1 precision decision)")
    ap.add_argument("--out",
                    default="artifacts/perf/batch_beam_capacity.json")
    args = ap.parse_args()
    os.environ["TRT_ASR_F32_PRECISION"] = args.f32_precision

    import jax
    import jax.numpy as jnp

    if os.environ.get("TRT_ASR_COMPILE_CACHE"):
        from trt_asr_tpu.runtime.engine import apply_compile_cache

        apply_compile_cache(os.environ["TRT_ASR_COMPILE_CACHE"])

    from bench import _device_init_params
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state
    from trt_asr_tpu.decode.beam_device import init_beam_device_state_batch
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.streaming.batch_engine import _batch_beam_step, _batch_step

    cfg = ModelConfig()
    dev = jax.devices()[0]
    B = args.batch
    print(f"device: {dev.device_kind}, B={B}, beam={args.beam}, "
          f"f32={args.f32_precision}", flush=True)
    t0 = time.time()
    params = _device_init_params(cfg, seed=0)
    b = np.asarray(params["joint"]["out"]["b"]).copy()
    b[cfg.blank_id] += args.blank_bias
    params["joint"]["out"]["b"] = jax.device_put(b)
    print(f"device param init: {time.time()-t0:.1f}s", flush=True)

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    chunk_ms = cfg.shift_size_frames[1] * 10.0
    max_tokens = cfg.max_symbols_per_timestep * (
        frames // cfg.subsampling_factor + 1)
    valid = jnp.full((B,), frames, jnp.int32)
    emitted = jnp.zeros((B,), jnp.int32)
    cache_drop = jnp.full((B,), cfg.cache_drop_size, jnp.int32)
    valid_cap = jnp.full((B,), cfg.valid_out_len, jnp.int32)
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(
        rng.standard_normal((B, frames, cfg.feat_in)).astype(np.float32))

    def greedy_arm(n):
        es = init_encoder_state(cfg, B)
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, B), [])
        f = feats0
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            f = f * 1.0001 + 0.001
            out = _batch_step(params, cfg, f, valid, es, ds, emitted,
                              cache_drop, valid_cap,
                              drop_extra=cfg.drop_extra_pre_encoded,
                              max_tokens=max_tokens)
            es, ds = out[2], out[3]
        _ = np.asarray(out[0])
        return (time.perf_counter() - t0) * 1e3 / n

    def beam_arm(n):
        es = init_encoder_state(cfg, B)
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, B), [])
        bst = init_beam_device_state_batch(cfg, ds, beam=args.beam,
                                           token_cap=args.token_cap)
        f = feats0
        nb = None
        t0 = time.perf_counter()
        for _ in range(n):
            f = f * 1.0001 + 0.001
            es, bst, _out, nb, _tb, _sat = _batch_beam_step(
                params, cfg, f, valid, es, bst, cache_drop, valid_cap,
                drop_extra=cfg.drop_extra_pre_encoded, beam=args.beam,
                expansion_k=4, max_symbols=cfg.max_symbols_per_timestep)
        _ = np.asarray(nb)
        return (time.perf_counter() - t0) * 1e3 / n

    arms = {"greedy": greedy_arm, "beam": beam_arm}
    for name, fn in arms.items():
        t0 = time.time()
        fn(1)
        print(f"{name} compile: {time.time()-t0:.1f}s", flush=True)

    rounds = {m: [] for m in arms}
    for r in range(args.rounds):
        for name, fn in arms.items():
            rounds[name].append(fn(args.steps))
        print(f"round {r}: " + "  ".join(
            f"{m} {rounds[m][-1]:.2f} ms/step" for m in arms), flush=True)

    g, d = min(rounds["greedy"]), min(rounds["beam"])
    summary = {
        "device": dev.device_kind, "batch": B, "beam": args.beam,
        "token_cap": args.token_cap,
        "mode": f"f32-{args.f32_precision}", "steps": args.steps,
        "rounds": rounds,
        "greedy_ms_per_step": round(g, 3),
        "beam_ms_per_step": round(d, 3),
        "greedy_streams_per_chip": round(B * chunk_ms / g, 1),
        "beam_streams_per_chip": round(B * chunk_ms / d, 1),
        "beam_vs_greedy": round(d / g, 2),
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rounds"}))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
