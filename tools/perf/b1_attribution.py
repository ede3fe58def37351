#!/usr/bin/env python3
"""Attribute the B=1 accuracy-mode streaming chunk step (VERDICT r5 #1).

BENCH_r04's headline — 6.7 ms chained mean per 240 ms chunk, f32-HIGHEST,
B=1 — had no decomposition: encoder vs decode scan vs dispatch/fence was
unknown, so there was nothing to attack. This tool measures interleaved
arms in ONE process (the only tunnel-robust comparison,
docs/DEBUGGING.md), each with the bench's exact chained varied-input
methodology (one host-fetch fence per N-step run, min over rounds):

  full   the production fused step (_batch_step: encoder + device TDT
         decode — bench.py's measured program)
  enc    encoder-only chained program (same encode call, decode removed)
  dec    decode-only chained program (tdt_greedy_decode_batch on
         perturbed encoder rows; carried DecodeState)
  disp   dispatch floor: a trivial jitted program taking the SAME params
         pytree + feats (arg marshaling included) with a token-sized
         fetch — the per-step cost that remains when compute is zero

Decomposition (reported to the artifact):
  dispatch_floor = disp
  encoder_ms     = enc - disp
  decode_ms      = dec - disp
  residual_ms    = full - enc - dec + disp   (fusion overlap; ~0 expected)

Params are generated on device (bench.py _device_init_params — no 2.4 GB
upload), blank-biased to the bench's 1.5 tok/chunk emission profile.

    python tools/perf/b1_attribution.py [--iters 60] [--rounds 4]
        [--f32-precision highest] [--out artifacts/perf/b1_attribution.json]
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
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--blank-bias", type=float, default=1.5)
    ap.add_argument("--f32-precision", default="highest",
                    choices=["high", "highest"])
    ap.add_argument("--weight-probes", action="store_true",
                    help="add enc_bf16 / enc_int8 timing-ablation arms "
                         "(bandwidth-bound check: time should track "
                         "weight bytes)")
    ap.add_argument("--out", default="artifacts/perf/b1_attribution.json")
    args = ap.parse_args()
    os.environ["TRT_ASR_F32_PRECISION"] = args.f32_precision

    import jax
    import jax.numpy as jnp

    if os.environ.get("TRT_ASR_COMPILE_CACHE"):
        from trt_asr_tpu.runtime.engine import apply_compile_cache

        apply_compile_cache(os.environ["TRT_ASR_COMPILE_CACHE"])

    from bench import _device_init_params
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.models.parakeet.encoder import encode
    from trt_asr_tpu.streaming.batch_engine import _batch_step

    cfg = ModelConfig()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, f32={args.f32_precision}", flush=True)

    t0 = time.time()
    params = _device_init_params(cfg, seed=0)
    b = np.asarray(params["joint"]["out"]["b"]).copy()
    b[cfg.blank_id] += args.blank_bias
    params["joint"]["out"]["b"] = jax.device_put(b)
    print(f"device param init: {time.time()-t0:.1f}s", flush=True)

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    max_tokens = cfg.max_symbols_per_timestep * (
        frames // cfg.subsampling_factor + 1)
    valid = jnp.full((1,), frames, jnp.int32)
    emitted = jnp.zeros((1,), jnp.int32)
    cache_drop = jnp.full((1,), cfg.cache_drop_size, jnp.int32)
    valid_cap = jnp.full((1,), cfg.valid_out_len, jnp.int32)
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(
        rng.standard_normal((1, frames, cfg.feat_in)).astype(np.float32))

    # ---- arms: each is (make_states, advance(f, states) -> (out0, states))
    def full_states():
        return (init_encoder_state(cfg, 1), init_decode_state(cfg, 1))

    def full_adv(f, states):
        toks, n, es, ds = _batch_step(
            params, cfg, f, valid, *states, emitted, cache_drop, valid_cap,
            drop_extra=cfg.drop_extra_pre_encoded, max_tokens=max_tokens)
        return toks, (es, ds)

    def enc_fn(p, f, es):
        enc, out_len, es = encode(
            p, cfg, f, valid, es, drop_extra=cfg.drop_extra_pre_encoded,
            cache_drop_vec=cache_drop, valid_cap_vec=valid_cap)
        return enc[:, :1, :8], out_len, es

    enc_j = jax.jit(enc_fn, donate_argnums=(2,))

    def enc_states():
        return (init_encoder_state(cfg, 1),)

    def enc_adv(f, states):
        o, _, es = enc_j(params, f, *states)
        return o, (es,)

    # decode arm: realistic encoder rows from one warm encode, perturbed
    # on device per step (same varied-input discipline as feats)
    def enc_full_fn(p, f, es):
        enc, out_len, es = encode(
            p, cfg, f, valid, es, drop_extra=cfg.drop_extra_pre_encoded,
            cache_drop_vec=cache_drop, valid_cap_vec=valid_cap)
        return enc, out_len, es

    enc_rows, t_enc, _ = jax.jit(enc_full_fn)(
        params, feats0, init_encoder_state(cfg, 1))
    t_enc = t_enc.astype(jnp.int32)
    print(f"decode-arm input: enc rows {enc_rows.shape}, "
          f"t_enc {np.asarray(t_enc)}", flush=True)

    def dec_fn(p, e, ds):
        toks, n, ds = tdt_greedy_decode_batch(
            p, cfg, e, t_enc, ds, max_tokens=max_tokens,
            emitted_so_far=emitted)
        return toks, ds

    dec_j = jax.jit(dec_fn, donate_argnums=(2,))

    def dec_states():
        return (jnp.asarray(enc_rows), init_decode_state(cfg, 1))

    def dec_adv(f, states):
        e, ds = states
        e = e * 1.0001 + 0.001           # perturb the decode input instead
        toks, ds = dec_j(params, e, ds)
        return toks, (e, ds)

    def disp_fn(p, f, s):
        # same arg tree as the real step (params pytree + feats + state);
        # compute is one scalar add + a token-sized output
        return f[:, :1, :8] + p["joint"]["out"]["b"][0] + s, s + 1.0

    disp_j = jax.jit(disp_fn)

    def disp_states():
        return (jnp.zeros((), jnp.float32),)

    def disp_adv(f, states):
        o, s = disp_j(params, f, *states)
        return o, (s,)

    arms = {"full": (full_states, full_adv), "enc": (enc_states, enc_adv),
            "dec": (dec_states, dec_adv), "disp": (disp_states, disp_adv)}

    # weight-format probes (TIMING ablations, numerics change): if the
    # encoder is weight-HBM-bound, its time should track weight BYTES —
    # f32 2.4 GB -> bf16 1.2 GB -> int8 0.6 GB per chunk step
    if args.weight_probes:
        from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
        from trt_asr_tpu.models.parakeet.quant import quantize_params

        p_bf16 = cast_params_for_compute(params, jnp.bfloat16)
        p_int8 = quantize_params(params, "encoder")

        def wp_arm(p, sdtype):
            def states():
                return (init_encoder_state(cfg, 1, dtype=sdtype),)

            def adv(f, st):
                o, _, es = enc_j(p, f, *st)
                return o, (es,)
            return states, adv

        arms["enc_bf16"] = wp_arm(p_bf16, jnp.bfloat16)
        arms["enc_int8"] = wp_arm(p_int8, jnp.float32)

    # warm/compile every arm first
    for name, (mk, adv) in arms.items():
        t0 = time.time()
        o, _ = adv(feats0, mk())
        _ = np.asarray(o)
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)

    # emission profile of the full step (honesty: decode workload)
    st = full_states()
    rate = []
    for k in range(4):
        toks, n, es, ds = _batch_step(
            params, cfg, feats0 * (1.0 + 0.02 * k), valid, *st, emitted,
            cache_drop, valid_cap, drop_extra=cfg.drop_extra_pre_encoded,
            max_tokens=max_tokens)
        st = (es, ds)
        rate.append(float(np.asarray(n).mean()))
    print(f"emission profile: {np.mean(rate):.2f} tok/chunk", flush=True)

    results = {m: [] for m in arms}
    for r in range(args.rounds):
        for name, (mk, adv) in arms.items():
            states = mk()
            f = feats0 * (1.0 + 0.03 * (r + 1))
            o, states = adv(f, states)       # re-warm donated buffers
            _ = np.asarray(o)
            t0 = time.perf_counter()
            for _i in range(args.iters):
                f = f * 1.0001 + 0.001
                o, states = adv(f, states)
            _ = np.asarray(o)                # ONE fence per chained run
            dt = (time.perf_counter() - t0) * 1e3 / args.iters
            results[name].append(dt)
        print(f"round {r}: " + "  ".join(
            f"{m} {results[m][-1]:.2f}" for m in arms), flush=True)

    best = {m: min(v) for m, v in results.items()}
    decomp = {
        "dispatch_floor_ms": best["disp"],
        "encoder_ms": best["enc"] - best["disp"],
        "decode_ms": best["dec"] - best["disp"],
        "residual_ms": best["full"] - best["enc"] - best["dec"]
        + best["disp"],
    }
    dominant = max(("encoder_ms", "decode_ms", "dispatch_floor_ms"),
                   key=lambda k: decomp[k])
    summary = {
        "config": {"mode": f"f32-{args.f32_precision}", "batch": 1,
                   "iters": args.iters, "rounds": args.rounds,
                   "blank_bias": args.blank_bias,
                   "tokens_per_chunk": round(float(np.mean(rate)), 2),
                   "device": dev.device_kind},
        "arms_ms": {m: round(v, 3) for m, v in best.items()},
        "arms_all_rounds_ms": {m: [round(x, 3) for x in v]
                               for m, v in results.items()},
        "decomposition_ms": {k: round(v, 3) for k, v in decomp.items()},
        "dominant_term": dominant,
        "note": "chained varied-input, one fence per run, min over "
                "interleaved rounds; enc/dec arms pay the same dispatch "
                "floor so deltas subtract it",
    }
    print(json.dumps(summary, indent=1))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
