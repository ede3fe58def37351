#!/usr/bin/env python3
"""Attribute the full-size f32-HIGH closed-loop parity floor (VERDICT r2 #1).

The r2 artifacts report ||jax_f32HIGH - torch_f32|| = 2.99e-4 at full size
while the tiny config passes the 1e-4 ORT rung — but that number conflates
TWO error sources: the JAX/TPU implementation's own rounding AND the torch
oracle's f32 rounding over 24 layers. A float64 oracle pass separates them:

  --oracle     run the torch oracle closed-loop in BOTH f32 and f64 on the
               golden feats/schedule; dump per-chunk encoder outputs (small:
               valid steps only) + the ||t32 - t64|| series.
  --jax        run the JAX closed loop (platform/precision per env/flags),
               score per-chunk error against BOTH dumped oracle series, and
               emit contract rung verdicts for each. ||jax - t64|| is the
               implementation's TRUE error; if ||t32 - t64|| is the same
               order, the published jax-vs-t32 floor is a two-sided f32
               accumulation artifact, not a TPU deficiency.

Reference role: tools/verify_nemo/verify.py compared against NeMo goldens;
with NeMo unavailable, precision-laddered self-attribution is the available
substitute (same method as r2's bf16 attribution, PERFNOTES).

    python tools/parity/attribute_fullsize_floor.py --oracle \
        --goldens-meta /tmp/goldens_full/streaming_encoder_reference.jsonl \
        --config full --seed 1 --out /tmp/floor_oracle.npz
    TRT_ASR_F32_PRECISION=high python tools/parity/attribute_fullsize_floor.py \
        --jax --oracle-npz /tmp/floor_oracle.npz --platform env \
        --summary artifacts/parity/floor_attribution_f32high.json
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.config import ModelConfig  # noqa: E402
from trt_asr_tpu.streaming import build_schedule  # noqa: E402


def _cfg_params(args):
    cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
    from trt_asr_tpu.models.parakeet.params import init_params

    return cfg, init_params(cfg, seed=args.seed)


def _feats_and_sched(cfg, total_frames, feats_seed):
    rng = np.random.default_rng(feats_seed)
    feats = (0.5 * rng.standard_normal((total_frames, cfg.feat_in))).astype(np.float32)
    return feats, build_schedule(total_frames, cfg)


def _read_meta(path):
    with open(path) as f:
        meta = json.loads(f.readline())
    assert meta["type"] == "meta"
    return meta["config"]


def run_oracle(args) -> int:
    cfg, params = _cfg_params(args)
    total, fseed = args.total_frames, args.feats_seed
    if args.goldens_meta:
        mcfg = _read_meta(args.goldens_meta)
        assert mcfg["num_layers"] == cfg.num_layers, "goldens/config mismatch"
        total, fseed = mcfg["total_frames"], mcfg["feats_seed"]
    feats, sched = _feats_and_sched(cfg, total, fseed)

    from oracle.torch_parakeet import TorchParakeet, set_oracle_dtype

    out = {}
    for dt in ("float32", "float64"):
        set_oracle_dtype(dt)
        oracle = TorchParakeet(cfg, params)
        np_dt = np.float32 if dt == "float32" else np.float64
        lc = np.zeros((1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np_dt)
        lt = np.zeros((1, cfg.num_layers, cfg.d_model, cfg.conv_context_size), np_dt)
        cache_len = 0
        for spec in sched:
            x = feats[spec.slice_start:spec.slice_end]
            valid = x.shape[0]
            if valid < spec.frames:
                x = np.pad(x, ((0, spec.frames - valid), (0, 0)))
            enc, vlen, lc, lt, cache_len = oracle.streaming_step(
                x[None], valid, lc, lt, cache_len, spec.drop_extra,
                keep_all=spec.is_last)
            out[f"{dt}_c{spec.idx}"] = np.asarray(enc[0], np.float64)
            out[f"len_c{spec.idx}"] = np.array([vlen])
        print(f"{dt}: {len(sched)} chunks done", flush=True)

    o32 = [out[f"float32_c{s.idx}"] for s in sched]
    o64 = [out[f"float64_c{s.idx}"] for s in sched]
    errs = [float(np.abs(a - b).max()) for a, b in zip(o32, o64)]
    out["t32_vs_t64"] = np.asarray(errs)
    out["n_chunks"] = np.array([len(sched)])
    # record the feature provenance so run_jax scores against the SAME
    # stream — an unnoticed feats_seed mismatch keeps the schedule length
    # identical and would silently publish garbage attribution numbers
    out["total_frames"] = np.array([total])
    out["feats_seed"] = np.array([fseed])
    np.savez_compressed(args.out, **out)
    print(f"oracle-side f32 error vs f64: max {max(errs):.3e} "
          f"mean {np.mean(errs):.3e}")
    print(f"wrote {args.out}")
    return 0


def run_jax(args) -> int:
    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax.numpy as jnp

    from trt_asr_tpu.contract import load_contract
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state
    from trt_asr_tpu.ops.common import _F32_PRECISION

    cfg, params = _cfg_params(args)
    dump = np.load(args.oracle_npz)
    n = int(dump["n_chunks"][0])
    # regenerate the EXACT oracle feature stream: take provenance from the
    # NPZ when present (older dumps lack it — fall back to the CLI args,
    # guarded only by the schedule-length assert)
    mcfg_total = int(dump["total_frames"][0]) if "total_frames" in dump \
        else args.total_frames
    fseed = int(dump["feats_seed"][0]) if "feats_seed" in dump \
        else args.feats_seed
    if "feats_seed" in dump and fseed != args.feats_seed:
        print(f"note: using feats_seed {fseed} from the oracle NPZ "
              f"(CLI said {args.feats_seed})", flush=True)
    feats, sched = _feats_and_sched(cfg, mcfg_total, fseed)
    assert len(sched) == n, f"schedule {len(sched)} != dumped {n}"

    jit_encode = functools.partial(
        jax.jit(encode, static_argnames=("cfg", "drop_extra", "cache_drop")))
    state = init_encoder_state(cfg, 1)
    errs32, errs64 = [], []
    for spec in sched:
        x = feats[spec.slice_start:spec.slice_end]
        valid = x.shape[0]
        if valid < spec.frames:
            x = np.pad(x, ((0, spec.frames - valid), (0, 0)))
        cache_drop = 0 if spec.is_last else cfg.cache_drop_size
        enc, out_len, state = jit_encode(
            params, cfg, jnp.asarray(x[None]), np.array([valid], np.int32),
            state, drop_extra=spec.drop_extra, cache_drop=cache_drop)
        enc = np.asarray(enc, np.float64)[0]
        vlen = int(np.asarray(out_len)[0])
        want_len = int(dump[f"len_c{spec.idx}"][0])
        assert vlen == want_len, (spec.idx, vlen, want_len)
        errs32.append(float(np.abs(enc[:vlen] - dump[f"float32_c{spec.idx}"][:vlen]).max()))
        errs64.append(float(np.abs(enc[:vlen] - dump[f"float64_c{spec.idx}"][:vlen]).max()))

    t32t64 = dump["t32_vs_t64"]
    tol = load_contract().tolerances
    summary = {
        "platform": args.platform,
        "f32_precision": str(_F32_PRECISION),
        "config": args.config, "seed": args.seed, "n_chunks": n,
        "jax_vs_torch32": {
            "max": max(errs32), "mean": float(np.mean(errs32)),
            "per_chunk": errs32, "rungs": tol.rung_verdicts(errs32)},
        "jax_vs_torch64_TRUE_ERROR": {
            "max": max(errs64), "mean": float(np.mean(errs64)),
            "per_chunk": errs64, "rungs": tol.rung_verdicts(errs64)},
        "torch32_vs_torch64_oracle_error": {
            "max": float(t32t64.max()), "mean": float(t32t64.mean()),
            "per_chunk": [float(v) for v in t32t64]},
    }
    print(f"jax({summary['f32_precision']},{args.platform}) vs t32: "
          f"max {max(errs32):.3e} | vs t64 (TRUE): max {max(errs64):.3e} | "
          f"oracle f32 self-error: max {t32t64.max():.3e}")
    print(f"true-error best rung: "
          f"{summary['jax_vs_torch64_TRUE_ERROR']['rungs']['best_rung']}")
    if args.summary:
        os.makedirs(os.path.dirname(args.summary) or ".", exist_ok=True)
        with open(args.summary, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.summary}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--oracle", action="store_true")
    ap.add_argument("--jax", action="store_true")
    ap.add_argument("--config", default="full", choices=["tiny", "full"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--feats-seed", type=int, default=0)
    ap.add_argument("--goldens-meta", default="",
                    help="goldens JSONL whose meta line fixes total_frames")
    ap.add_argument("--total-frames", type=int, default=737)
    ap.add_argument("--out", default="/tmp/floor_oracle.npz")
    ap.add_argument("--oracle-npz", default="/tmp/floor_oracle.npz")
    ap.add_argument("--platform", default="env", choices=["cpu", "tpu", "env"])
    ap.add_argument("--summary", default="")
    args = ap.parse_args()
    if args.oracle:
        return run_oracle(args)
    if args.jax:
        return run_jax(args)
    print("pick --oracle or --jax")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
