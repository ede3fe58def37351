#!/usr/bin/env python3
"""Full-size TPU latency of the DEVICE beam search vs the greedy fused
step, interleaved in ONE process (the only tunnel-robust comparison —
docs/DEBUGGING.md), plus a short host-beam contrast arm.

    python tools/perf/beam_tpu.py [--beam 4] [--steps 30] [--rounds 3]
        [--dtype f32|bf16] [--out artifacts/perf/beam_tpu.json]

VERDICT r3 #1's done-bar: a measured TPU B=1 beam ms/chunk, target <=2x
greedy. Arms per round:
- greedy: the production fused chunk program (encoder + on-device greedy
  TDT), chained varied inputs, one fence per run;
- beam-dev: encoder-only chunk program + the device beam program
  (decode/beam_device.py) chained the same way (two device dispatches
  per chunk vs greedy's one);
- beam-host (few chunks): the host oracle loop (per-frontier-step device
  round trips) — the reference-antipattern contrast.
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
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--host-chunks", type=int, default=4)
    ap.add_argument("--token-cap", type=int, default=512)
    ap.add_argument("--blank-bias", type=float, default=1.5)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    ap.add_argument("--out", default="artifacts/perf/beam_tpu.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state
    from trt_asr_tpu.decode.beam import (
        BeamSearchState, beam_advance, beam_start, make_host_fns)
    from trt_asr_tpu.decode.beam_device import (
        init_beam_device_state, tdt_beam_chunk_device)
    from trt_asr_tpu.models.parakeet import init_encoder_state, init_params
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.streaming.batch_engine import _batch_step
    from trt_asr_tpu.streaming.beam_session import _beam_encode_step

    cfg = ModelConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    t0 = time.time()
    params = init_params(cfg, seed=0)
    b = np.asarray(params["joint"]["out"]["b"]).copy()
    b[cfg.blank_id] += args.blank_bias      # speech-like emission profile
    params["joint"]["out"]["b"] = b
    if args.dtype == "bf16":
        params = cast_params_for_compute(params, jnp.bfloat16)
    params = jax.device_put(params)
    print(f"params init+put: {time.time()-t0:.1f}s", flush=True)

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]   # 57
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(
        rng.standard_normal((1, frames, cfg.feat_in)).astype(np.float32))
    valid = jnp.full((1,), frames, jnp.int32)
    emitted = jnp.zeros((1,), jnp.int32)
    cache_drop = jnp.full((1,), cfg.cache_drop_size, jnp.int32)
    valid_cap = jnp.full((1,), cfg.valid_out_len, jnp.int32)
    max_tokens = cfg.max_symbols_per_timestep * (frames // cfg.subsampling_factor + 1)

    def greedy_arm(n):
        es = init_encoder_state(cfg, 1, dtype=dtype)
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        f = feats0
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            f = f * 1.0001 + 0.001
            out = _batch_step(params, cfg, f, valid, es, ds, emitted,
                              cache_drop, valid_cap,
                              drop_extra=cfg.drop_extra_pre_encoded,
                              max_tokens=max_tokens)
            es, ds = out[2], out[3]
        _ = np.asarray(out[0])
        return (time.perf_counter() - t0) * 1e3 / n

    def beam_dev_arm(n):
        es = init_encoder_state(cfg, 1, dtype=dtype)
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        bst = init_beam_device_state(cfg, ds, beam=args.beam,
                                     token_cap=args.token_cap)
        f = feats0
        t0 = time.perf_counter()
        for _ in range(n):
            f = f * 1.0001 + 0.001
            enc, out_len, es = _beam_encode_step(
                params, cfg, f, np.int32(frames), es,
                drop_extra=cfg.drop_extra_pre_encoded,
                cache_drop=cfg.cache_drop_size, valid_cap=cfg.valid_out_len)
            bst = tdt_beam_chunk_device(
                params, cfg, enc[0], out_len[0].astype("int32"), bst,
                beam=args.beam, max_symbols=cfg.max_symbols_per_timestep)
        _ = np.asarray(bst.score)
        _ = np.asarray(bst.tokens[:, :4])
        return (time.perf_counter() - t0) * 1e3 / n

    def beam_host_arm(n):
        es = init_encoder_state(cfg, 1, dtype=dtype)
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        j_fn, p_fn, j_batch = make_host_fns(params)
        bs = beam_start(np.asarray(ds.g)[0], int(np.asarray(ds.y_id)[0]),
                        (ds.h, ds.c))
        f = feats0
        t0 = time.perf_counter()
        for _ in range(n):
            f = f * 1.0001 + 0.001
            enc, out_len, es = _beam_encode_step(
                params, cfg, f, np.int32(frames), es,
                drop_extra=cfg.drop_extra_pre_encoded,
                cache_drop=cfg.cache_drop_size, valid_cap=cfg.valid_out_len)
            t_out = int(np.asarray(out_len)[0])
            bs = beam_advance(
                bs, np.asarray(enc)[0, :t_out], j_fn, p_fn,
                blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
                duration_values=cfg.duration_values, beam=args.beam,
                max_symbols=cfg.max_symbols_per_timestep,
                joint_batch_fn=j_batch)
        return (time.perf_counter() - t0) * 1e3 / n

    # compile all arms
    t0 = time.time()
    greedy_arm(1)
    print(f"greedy compile: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    beam_dev_arm(1)
    print(f"beam-device compile: {time.time()-t0:.1f}s", flush=True)

    rounds = {"greedy": [], "beam_dev": []}
    for r in range(args.rounds):
        rounds["greedy"].append(greedy_arm(args.steps))
        rounds["beam_dev"].append(beam_dev_arm(args.steps))
        print(f"round {r}: greedy {rounds['greedy'][-1]:.3f} ms, "
              f"beam-dev {rounds['beam_dev'][-1]:.3f} ms", flush=True)
    host_ms = beam_host_arm(args.host_chunks) if args.host_chunks else None
    if host_ms is not None:
        print(f"beam-host contrast: {host_ms:.1f} ms/chunk "
              f"({args.host_chunks} chunks)", flush=True)

    g = min(rounds["greedy"])
    d = min(rounds["beam_dev"])
    summary = {
        "device": dev.device_kind, "dtype": args.dtype, "beam": args.beam,
        "token_cap": args.token_cap, "steps": args.steps,
        "rounds": rounds,
        "greedy_ms": round(g, 3), "beam_device_ms": round(d, 3),
        "beam_vs_greedy": round(d / g, 2),
        "beam_host_ms": round(host_ms, 1) if host_ms is not None else None,
        "target_met_2x": d <= 2 * g,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "rounds"}))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fjson:
            json.dump(summary, fjson, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
