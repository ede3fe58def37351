#!/usr/bin/env python3
"""Cache forensics: the three checks that localized the reference's
cache_last_time drift bug, reimplemented against the JAX encoder.

Parity with /root/reference/tools/onnxruntime/diagnose_cache_time_mismatch.py
(:64-250) and ort_cache_sensitivity.py (zero-vs-real cache A/B):

- check 1  per-axis error distribution — is the mismatch concentrated on one
  index of an axis (classic padding-side bug)?
- check 2  masked error — does the mismatch live only where the reference is
  near zero (padding junk, non-semantic)?
- check 3  perturbation sensitivity — does the suspect cache tensor actually
  affect encoder_output (zero + gaussian-noise sweep), i.e. is a mismatch
  blocking or semantically dead?

Each check returns a dict with an ``interpretation`` field using the
reference's taxonomy, so its debugging playbook transfers verbatim.

Usage (library or CLI):
  python tools/parity/cache_diagnostics.py --chunks 8 --perturb time
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any, Dict

import numpy as np

sys.path.insert(0, ".")


def per_axis_error(got: np.ndarray, ref: np.ndarray, axis: int,
                   axis_name: str = "K", verbose: bool = True) -> Dict[str, Any]:
    """Reference check 1 (diagnose_cache_time_mismatch.py:64-116),
    generalized to any axis."""
    got, ref = np.asarray(got), np.asarray(ref)
    n = min(got.shape[axis], ref.shape[axis])
    results = {}
    maxes = []
    for k in range(n):
        d = np.abs(np.take(got, k, axis=axis) - np.take(ref, k, axis=axis))
        results[f"{axis_name}={k}"] = {
            "max_abs": float(d.max()), "mean_abs": float(d.mean()),
            "std_abs": float(d.std()),
        }
        maxes.append(float(d.max()))
    maxes = np.asarray(maxes)
    worst, best = int(maxes.argmax()), int(maxes.argmin())
    ratio = float(maxes[worst] / (maxes[best] + 1e-12))
    if ratio > 10:
        interp = "padding_side_mismatch"
    elif float(maxes.max()) / float(maxes.min() + 1e-12) < 2:
        interp = "uniform_error"
    else:
        interp = "mixed"
    out = {"results": results, "worst": worst, "best": best, "ratio": ratio,
           "interpretation": interp}
    if verbose:
        print(f"CHECK 1: per-{axis_name} error — worst {axis_name}={worst} "
              f"(max {maxes[worst]:.3e}), ratio {ratio:.1f}x -> {interp}")
    return out


def masked_error(got: np.ndarray, ref: np.ndarray, threshold: float = 1e-3,
                 verbose: bool = True) -> Dict[str, Any]:
    """Reference check 2 (:118-183): compare only where abs(ref) > threshold."""
    got, ref = np.asarray(got), np.asarray(ref)
    diff = np.abs(got - ref)
    mask = np.abs(ref) > threshold
    out: Dict[str, Any] = {
        "threshold": threshold,
        "pct_significant": float(100.0 * mask.sum() / ref.size),
        "max_abs_full": float(diff.max()),
        "mean_abs_full": float(diff.mean()),
    }
    if not mask.any():
        out["interpretation"] = "all_near_zero"
        return out
    out["max_abs_masked"] = float(diff[mask].max())
    out["mean_abs_masked"] = float(diff[mask].mean())
    ratio = out["max_abs_full"] / (out["max_abs_masked"] + 1e-12)
    out["reduction_ratio"] = float(ratio)
    out["interpretation"] = ("padding_junk" if ratio > 10
                             else "real_error" if ratio < 1.5 else "mixed")
    if verbose:
        print(f"CHECK 2: masked error — full {out['max_abs_full']:.3e} vs "
              f"masked {out['max_abs_masked']:.3e} "
              f"({ratio:.1f}x) -> {out['interpretation']}")
    return out


def cache_sensitivity(params, cfg, feats: np.ndarray, valid: int, state,
                      which: str = "time", drop_extra: int = 0,
                      cache_drop: int = 0, noise_scales=(0.1, 0.2, 0.3),
                      seed: int = 0, verbose: bool = True) -> Dict[str, Any]:
    """Reference check 3 (:185-249) + ort_cache_sensitivity.py zero-vs-real
    A/B: perturb one cache tensor at the CONTRACT boundary (zero it, then
    gaussian noise at increasing sigma), re-run the chunk, and measure the
    encoder_output delta. which: 'time' | 'channel' | 'len'."""
    import jax.numpy as jnp

    from trt_asr_tpu.models.parakeet.encoder import (
        encode, state_from_contract, state_to_contract)

    key = {"time": "cache_last_time", "channel": "cache_last_channel",
           "len": "cache_last_channel_len"}[which]
    contract = {k: np.asarray(v) for k, v in state_to_contract(state).items()}
    lengths = np.asarray([valid], np.int32)

    def run(c):
        st = state_from_contract({k: jnp.asarray(v) for k, v in c.items()}, params)
        enc, out_len, _ = encode(params, cfg, jnp.asarray(feats), lengths, st,
                                 drop_extra=drop_extra, cache_drop=cache_drop)
        return np.asarray(enc)[:, : int(np.asarray(out_len)[0])]

    baseline = run(contract)
    rng = np.random.default_rng(seed)
    results = []

    def probe(name, tensor):
        c = dict(contract)
        c[key] = tensor
        d = np.abs(run(c) - baseline)
        rec = {"perturbation": name, "max_abs": float(d.max()),
               "mean_abs": float(d.mean())}
        results.append(rec)
        if verbose:
            print(f"  {name}: delta max {rec['max_abs']:.3e} "
                  f"mean {rec['mean_abs']:.3e}")

    probe("zeros", np.zeros_like(contract[key]))
    for s in noise_scales:
        probe(f"noise_sigma={s}",
              contract[key] + rng.standard_normal(contract[key].shape)
              .astype(contract[key].dtype) * s)

    max_effect = max(r["max_abs"] for r in results)
    interp = ("not_used" if max_effect < 1e-5
              else "weakly_sensitive" if max_effect < 1e-3
              else "strongly_sensitive")
    if verbose:
        print(f"CHECK 3: {key} sensitivity — max effect {max_effect:.3e} "
              f"-> {interp}")
    return {"tensor": key, "results": results, "max_effect": float(max_effect),
            "interpretation": interp}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunks", type=int, default=6,
                    help="warm the caches with this many streaming chunks")
    ap.add_argument("--perturb", default="time",
                    choices=["time", "channel", "len"])
    ap.add_argument("--tiny", action="store_true", default=True)
    ap.add_argument("--full", dest="tiny", action="store_false")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("tpu",):
        jax.config.update("jax_platforms", "cpu")
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state, init_params
    from trt_asr_tpu.streaming import build_schedule
    from trt_asr_tpu.streaming.schedule import extract_chunk

    cfg = ModelConfig.tiny() if args.tiny else ModelConfig()
    params = init_params(cfg, seed=1)
    rng = np.random.default_rng(args.seed)
    first, steady = cfg.chunk_size_frames
    shift = cfg.shift_size_frames[1]
    total = first + shift * args.chunks + steady
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total, cfg)

    state = init_encoder_state(cfg, 1)
    import jax.numpy as jnp

    for spec in sched[: args.chunks]:
        x = extract_chunk(feats, spec)
        _, _, state = encode(params, cfg, jnp.asarray(x[None]),
                             np.asarray([spec.valid_frames], np.int32), state,
                             drop_extra=spec.drop_extra,
                             cache_drop=cfg.cache_drop_size)

    spec = sched[args.chunks]
    x = extract_chunk(feats, spec)[None]
    report = {
        "config": "tiny" if args.tiny else "full",
        "warm_chunks": args.chunks,
        "sensitivity": cache_sensitivity(
            params, cfg, x, spec.valid_frames, state, which=args.perturb,
            drop_extra=spec.drop_extra, cache_drop=cfg.cache_drop_size,
            seed=args.seed),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
