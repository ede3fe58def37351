#!/usr/bin/env python3
"""Attribute the 30 s offline MFU plateau term-by-term (VERDICT r3 #2).

r3's flash-kernel control proved the plateau is NOT score-materialization
HBM traffic (the kernel that eliminates it is 3-7% slower). This tool
measures the remaining suspects directly: interleaved arms in ONE process
(tunnel-robust), each arm a fresh-jitted offline encode with one
attention term surgically removed (numerics change — these are TIMING
ablations, not serving configs):

  full        the production XLA attention path
  nobias      rel-pos bias term zeroed (removes the [B,H,T,2T-1] pd
              matmul + the Transformer-XL shift)
  nosoftmax   softmax replaced by a scale (removes the f32 VPU pass)
  noatt       whole attention core replaced by v-mean (matmul floor:
              everything except scores/bias/softmax/context)
  flash       the r3 Pallas control kernel (reference point)

The residual decomposition full = noatt + (scores+context) + bias +
softmax, each term measured as an arm delta, against each term's
theoretical minimum (FLOPs / peak for MXU terms, bytes / BW for the
softmax pass) is the roofline note's data.

    python tools/perf/offline_att_ablation.py --seconds 30 --batch 32
        [--rounds 3] [--out artifacts/perf/offline_att_ablation.json]
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--out", default="artifacts/perf/offline_att_ablation.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet import init_params, offline_encode
    from trt_asr_tpu.models.parakeet import encoder as enc_mod
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.ops.common import einsum, matmul

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

    b = args.batch
    frames = int(args.seconds * 100)
    rng = np.random.default_rng(0)
    feats0 = jnp.asarray(
        rng.standard_normal((b, frames, cfg.feat_in)).astype(np.float32))
    lens = jnp.full((b,), frames, jnp.int32)

    # NOTE the patch point: encoder.py binds rel_pos_attention_kv by NAME
    # (`from trt_asr_tpu.ops.attention import rel_pos_attention_kv`), so the
    # patch must go into the ENCODER module's namespace — patching
    # ops.attention's global silently leaves the encoder on the real code
    # (caught in r4: the first run produced 5 identical arms)
    real_kv = enc_mod.rel_pos_attention_kv

    def make_patched(mode):
        def patched(q, k, v, pos_proj, pos_bias_u, pos_bias_v, wo,
                    kv_mask=None, rel_idx=None, use_flash=False):
            if mode == "full":
                return real_kv(q, k, v, pos_proj, pos_bias_u, pos_bias_v,
                               wo, kv_mask, rel_idx, use_flash=False)
            if mode == "flash":
                return real_kv(q, k, v, pos_proj, pos_bias_u, pos_bias_v,
                               wo, kv_mask, rel_idx, use_flash=True)
            bsz, tq, h, dh = q.shape
            tkv = k.shape[1]
            if mode == "noatt":
                # matmul floor: context = per-batch v mean broadcast (no
                # scores, no bias, no softmax, no [T,T] anything)
                out = jnp.broadcast_to(v.mean(axis=1, keepdims=True),
                                       (bsz, tq, h, dh))
                return matmul(out.reshape(bsz, tq, h * dh), wo)
            q_u = q + pos_bias_u.astype(q.dtype)[None, None]
            ac = einsum("bthd,bshd->bhts", q_u, k)
            if mode == "nobias":
                scores = ac.astype(jnp.float32) / math.sqrt(dh)
            else:   # bias variants (nosoftmax keeps the full bias term)
                q_v = q + pos_bias_v.astype(q.dtype)[None, None]
                if mode in ("biasmm", "biasmmnoshift"):
                    # alt formulation: explicit head-batched dot_general
                    # with q laid out [H, B*T, dh] (one transpose) instead
                    # of the einsum's chosen lowering
                    qh = q_v.transpose(2, 0, 1, 3).reshape(h, bsz * tq, dh)
                    ph = pos_proj.astype(q.dtype).transpose(1, 2, 0)  # [H,dh,R]
                    pd = jax.lax.dot_general(
                        qh, ph, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32
                    ).astype(q.dtype)                      # [H, B*T, R]
                    pd = pd.reshape(h, bsz, tq, -1).transpose(1, 0, 2, 3)
                else:
                    pd = einsum("bthd,rhd->bhtr", q_v,
                                pos_proj.astype(q.dtype))
                r = pd.shape[-1]
                if mode in ("biasnoshift", "biasmmnoshift"):
                    bd = pd[..., :tkv]      # einsum cost only (wrong values)
                else:
                    padded = jnp.pad(pd, ((0, 0), (0, 0), (0, 0), (1, 0)))
                    bd = padded.reshape(bsz, h, tq * (r + 1))[..., tq:] \
                        .reshape(bsz, h, tq, r)[..., :tkv]
                    if mode == "biasbarrier":
                        # force bd to MATERIALIZE as one contiguous copy
                        # instead of fusing the skewed indexing into the
                        # score add (suspected per-element index-arithmetic
                        # pathology)
                        bd = jax.lax.optimization_barrier(bd)
                scores = (ac + bd).astype(jnp.float32) / math.sqrt(dh)
            if kv_mask is not None:
                scores = jnp.where(kv_mask[:, None, None, :], scores,
                                   jnp.float32(-1e30))
            if mode == "nosoftmax":
                att = (scores / tkv).astype(q.dtype)   # scale, no VPU pass
            else:
                att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            out = einsum("bhts,bshd->bthd", att, v).reshape(bsz, tq, h * dh)
            return matmul(out, wo)
        return patched

    def make_arm(mode):
        def fn(p, f):
            enc, out_len = offline_encode(
                p, cfg, f, lens, compute_dtype=dtype,
                use_flash_att=(mode == "flash"))
            return enc[:, :1, :64], out_len   # tiny fetch
        return jax.jit(fn)

    arms = ["full", "nobias", "nosoftmax", "noatt", "flash",
            "biasnoshift", "biasbarrier"]
    jitted = {}
    for m in arms:
        enc_mod.rel_pos_attention_kv = make_patched(m)
        t0 = time.time()
        j = make_arm(m)
        out = j(params, feats0)
        _ = np.asarray(out[0])
        jitted[m] = j
        print(f"{m}: compile+first {time.time()-t0:.1f}s", flush=True)
    enc_mod.rel_pos_attention_kv = real_kv

    results = {m: [] for m in arms}
    for r in range(args.rounds):
        for m in arms:
            enc_mod.rel_pos_attention_kv = real_kv   # already traced
            f = feats0 * (1 + 0.01 * (r + 1))
            t0 = time.perf_counter()
            out = jitted[m](params, f)
            _ = np.asarray(out[0])
            results[m].append((time.perf_counter() - t0) * 1e3)
        print(f"round {r}: " + "  ".join(
            f"{m} {results[m][-1]:.1f}" for m in arms), flush=True)

    best = {m: min(v) for m, v in results.items()}
    t_sub = frames
    for _ in range(cfg.stride_stages):
        t_sub = (t_sub - 1) // 2 + 1
    T = t_sub
    L, H, dh, D = cfg.num_layers, cfg.n_heads, cfg.head_dim, cfg.d_model
    R = 2 * T - 1
    gf = lambda x: x / 1e9  # noqa: E731
    flops = {
        "scores_context": 2 * (2 * b * H * T * T * dh) * L,
        "bias_pd": 2 * b * H * T * R * dh * L,
        "softmax_elems": b * H * T * T * L,
    }
    deltas = {}
    if {"nosoftmax", "nobias", "full", "noatt"} <= set(best):
        deltas = {
            "bias_ms": best["nosoftmax"] - best["nobias"],
            # nosoftmax keeps bias; nobias keeps softmax — recover terms:
            # full = base + scores + bias + softmax
            "softmax_ms": best["full"] - best["nosoftmax"],
            "scores_context_ms": best["nobias"]
            - (best["full"] - best["nosoftmax"]) - best["noatt"],
            "matmul_floor_ms": best["noatt"],
        }
    if "biasnoshift" in best and "full" in best:
        deltas["shift_only_ms"] = best["full"] - best["biasnoshift"]
    peak = 197e12 if args.dtype == "bf16" else 98.5e12
    theo = {
        "scores_context_ms_min": flops["scores_context"] / peak * 1e3,
        "bias_ms_min": flops["bias_pd"] / peak * 1e3,
        # softmax floor: one f32 read+write of the score tensor at ~800GB/s
        "softmax_ms_min": flops["softmax_elems"] * 8 / 800e9 * 1e3,
    }
    summary = {
        "device": dev.device_kind, "dtype": args.dtype, "batch": b,
        "seconds": args.seconds, "T": T, "results_ms": results,
        "best_ms": {k: round(v, 1) for k, v in best.items()},
        "deltas_ms": {k: round(v, 1) for k, v in deltas.items()},
        "theoretical_min_ms": {k: round(v, 1) for k, v in theo.items()},
        "t2_flops_gflop": {k: round(gf(v), 1) for k, v in flops.items()
                           if k != "softmax_elems"},
    }
    print(json.dumps({k: summary[k] for k in
                      ("best_ms", "deltas_ms", "theoretical_min_ms")}))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as fj:
            json.dump(summary, fj, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
