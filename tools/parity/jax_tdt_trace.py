#!/usr/bin/env python3
"""TDT decode trace from the JAX implementation (compare against the
oracle's tdt_trace.jsonl via compare_tdt_trace.py). Uses the same seeded
feature stream as gen_goldens --trace.

    python tools/parity/jax_tdt_trace.py --out trace.jsonl \
        [--config tiny --seed 1 | --model-dir DIR] [--feats-seed 0] [--frames N]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--config", default="tiny", choices=["tiny", "full"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--feats-seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    args = ap.parse_args()

    import os
    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax
    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import tdt_greedy_decode_host
    from trt_asr_tpu.models.parakeet import init_params, offline_encode
    from trt_asr_tpu.models.parakeet.joint import joint_single_step
    from trt_asr_tpu.models.parakeet.predictor import predictor_step

    if args.model_dir:
        from trt_asr_tpu.models.parakeet.model import ParakeetTDT

        m = ParakeetTDT.from_model_dir(args.model_dir)
        cfg, params = m.cfg, m.params
    else:
        cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
        params = init_params(cfg, seed=args.seed)

    rng = np.random.default_rng(args.feats_seed)
    feats = (0.5 * rng.standard_normal((1, args.frames, cfg.feat_in))).astype(np.float32)
    enc, enc_len = offline_encode(params, cfg, feats, np.array([args.frames], np.int32))
    t = int(np.asarray(enc_len)[0])

    h = np.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden), np.float32)
    g, h, c = predictor_step(params["predictor"], np.array([cfg.blank_id], np.int32), h, h)

    def joint_fn(enc_t, gg):
        return np.asarray(joint_single_step(params["joint"], enc_t[None], gg[None]))[0]

    def pred_fn(tok, st):
        hh, cc = st
        gg, h2, c2 = predictor_step(params["predictor"], np.array([tok], np.int32), hh, cc)
        return np.asarray(gg)[0], (h2, c2)

    trace = []
    toks, _, _, _ = tdt_greedy_decode_host(
        np.asarray(enc)[0, :t], joint_fn, pred_fn, (h, c), np.asarray(g)[0],
        cfg.blank_id, blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values,
        max_symbols=cfg.max_symbols_per_timestep, trace=trace)
    with open(args.out, "w") as f:
        f.write(json.dumps({"type": "meta", "blank_id": cfg.blank_id, "t_enc": t,
                            "emitted": toks,
                            "duration_values": list(cfg.duration_values)}) + "\n")
        for rec in trace:
            f.write(json.dumps(rec) + "\n")
    print(f"jax trace: {len(trace)} steps, {len(toks)} tokens -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
