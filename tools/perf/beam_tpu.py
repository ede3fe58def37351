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
- beam-lm / beam-bias (VERDICT r4 #5): the same device beam with a
  full-vocab n-gram LM (order 3, fitted on random sequences) / a 50-
  phrase biasing trie compiled to device tables (decode/lm_device.py)
  fused into the expansion — target: fused <= 1.2x the unfused beam;
- beam-host (few chunks): the host oracle loop (per-frontier-step device
  round trips) — the reference-antipattern contrast.

Params are generated on device (bench.py _device_init_params, VERDICT r4
#6) — no 2.4 GB tunnel upload.
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

    if os.environ.get("TRT_ASR_COMPILE_CACHE"):
        from trt_asr_tpu.runtime.engine import apply_compile_cache

        apply_compile_cache(os.environ["TRT_ASR_COMPILE_CACHE"])

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

    from bench import _device_init_params

    cfg = ModelConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", flush=True)
    t0 = time.time()
    params = _device_init_params(cfg, seed=0)
    b = np.asarray(params["joint"]["out"]["b"]).copy()
    b[cfg.blank_id] += args.blank_bias      # speech-like emission profile
    params["joint"]["out"]["b"] = jax.device_put(b)
    if args.dtype == "bf16":
        params = cast_params_for_compute(params, jnp.bfloat16)
    print(f"params device-init: {time.time()-t0:.1f}s", flush=True)

    # device LM tables at FULL vocab (VERDICT r4 #5): an order-3 n-gram
    # over random sequences (~40k trigram entries) and a 50-phrase trie
    from trt_asr_tpu.decode.biasing import BiasingLM
    from trt_asr_tpu.decode.lm_device import biasing_to_device, ngram_to_device
    from trt_asr_tpu.decode.ngram_lm import NGramLM

    r_lm = np.random.default_rng(3)
    seqs = [r_lm.integers(0, cfg.token_head_size, size=20).tolist()
            for _ in range(2000)]
    lm = NGramLM.fit(seqs, order=3, vocab_size=cfg.token_head_size)
    lm_spec, lm_tables = ngram_to_device(lm)
    lm_sizes = [int(lev.tok.shape[0]) for lev in lm_tables.levels]
    phrases = [tuple(r_lm.integers(0, cfg.token_head_size,
                                   size=int(r_lm.integers(2, 5))).tolist())
               for _ in range(50)]
    cont = {}
    for p in phrases:
        for k in range(len(p)):
            cont.setdefault(p[:k], set()).add(p[k])
    bias = BiasingLM(cont, max(len(p) - 1 for p in phrases), 3.0,
                     cfg.token_head_size)
    b_spec, b_tables = biasing_to_device(bias)
    print(f"LM tables: ngram levels {lm_sizes}, "
          f"trie levels {[int(l.tok.shape[0]) for l in b_tables.levels]}",
          flush=True)

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

    def beam_dev_arm(n, spec=None, tables=None, weight=0.0):
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
                beam=args.beam, max_symbols=cfg.max_symbols_per_timestep,
                lm_spec=spec, lm_tables=tables, lm_weight=weight)
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

    arms = {
        "greedy": lambda n: greedy_arm(n),
        "beam_dev": lambda n: beam_dev_arm(n),
        "beam_lm": lambda n: beam_dev_arm(n, lm_spec, lm_tables, 0.3),
        "beam_bias": lambda n: beam_dev_arm(n, b_spec, b_tables, 1.0),
    }
    for name, fn in arms.items():
        t0 = time.time()
        fn(1)
        print(f"{name} compile: {time.time()-t0:.1f}s", flush=True)

    rounds = {m: [] for m in arms}
    for r in range(args.rounds):
        for name, fn in arms.items():
            rounds[name].append(fn(args.steps))
        print(f"round {r}: " + "  ".join(
            f"{m} {rounds[m][-1]:.3f}" for m in arms), flush=True)
    host_ms = beam_host_arm(args.host_chunks) if args.host_chunks else None
    if host_ms is not None:
        print(f"beam-host contrast: {host_ms:.1f} ms/chunk "
              f"({args.host_chunks} chunks)", flush=True)

    g = min(rounds["greedy"])
    d = min(rounds["beam_dev"])
    dl = min(rounds["beam_lm"])
    db = min(rounds["beam_bias"])
    summary = {
        "device": dev.device_kind, "dtype": args.dtype, "beam": args.beam,
        "token_cap": args.token_cap, "steps": args.steps,
        "lm": {"order": 3, "vocab": cfg.token_head_size,
               "level_sizes": lm_sizes, "weight": 0.3},
        "bias": {"phrases": len(phrases), "bonus": 3.0, "weight": 1.0},
        "rounds": rounds,
        "greedy_ms": round(g, 3), "beam_device_ms": round(d, 3),
        "beam_lm_ms": round(dl, 3), "beam_bias_ms": round(db, 3),
        "beam_vs_greedy": round(d / g, 2),
        "lm_vs_unfused_beam": round(dl / d, 2),
        "bias_vs_unfused_beam": round(db / d, 2),
        "beam_host_ms": round(host_ms, 1) if host_ms is not None else None,
        "target_met_2x": d <= 2 * g,
        "fused_target_met_1p2x": dl <= 1.2 * d and db <= 1.2 * d,
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
