#!/usr/bin/env python3
"""Golden-reference generation from the torch oracle.

Reference equivalents: tools/verify_nemo/streaming_encoder_reference.py
(full-tensor base64 JSONL per streaming chunk) and tdt_trace.py (per-step
decode trace). The oracle here is the independent torch implementation
(oracle/torch_parakeet.py), seeded or loaded from a model dir — the root of
the parity ladder in this repo (SURVEY §4 methodology).

    python tools/parity/gen_goldens.py --out-dir goldens \
        [--model-dir DIR | --config tiny|full --seed 1] \
        [--chunks 50] [--trace] [--feats-seed 0]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.config import ModelConfig  # noqa: E402
from trt_asr_tpu.io.fixtures import write_jsonl  # noqa: E402
from trt_asr_tpu.streaming import build_schedule  # noqa: E402


def _load(args):
    from oracle.torch_parakeet import TorchParakeet

    if args.model_dir:
        from trt_asr_tpu.models.parakeet.model import ParakeetTDT

        m = ParakeetTDT.from_model_dir(args.model_dir)
        return m.cfg, m.params, TorchParakeet(m.cfg, m.params)
    cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
    from trt_asr_tpu.models.parakeet.params import init_params

    params = init_params(cfg, seed=args.seed)
    return cfg, params, TorchParakeet(cfg, params)


def gen_streaming_records(cfg, oracle, total_frames, feats_seed):
    rng = np.random.default_rng(feats_seed)
    feats = (0.5 * rng.standard_normal((total_frames, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total_frames, cfg)
    lc = np.zeros((1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32)
    lt = np.zeros((1, cfg.num_layers, cfg.d_model, cfg.conv_context_size), np.float32)
    cache_len = 0
    yield {"type": "meta", "config": {
        "num_layers": cfg.num_layers, "d_model": cfg.d_model, "feat_in": cfg.feat_in,
        "att_cache_size": cfg.att_cache_size, "total_frames": total_frames,
        "feats_seed": feats_seed, "num_chunks": len(sched)}}
    for spec in sched:
        x = feats[spec.slice_start:spec.slice_end]
        valid = x.shape[0]
        if valid < spec.frames:
            x = np.pad(x, ((0, spec.frames - valid), (0, 0)))
        lc_in, lt_in, len_in = lc.copy(), lt.copy(), cache_len
        enc, vlen, lc, lt, cache_len = oracle.streaming_step(
            x[None], valid, lc, lt, cache_len, spec.drop_extra, keep_all=spec.is_last)
        yield {
            "type": "chunk", "chunk_idx": spec.idx, "is_last": spec.is_last,
            "drop_extra": spec.drop_extra, "valid_frames": valid,
            "frames": spec.frames,
            "inputs": {"audio_features": x.astype(np.float32),
                       "cache_last_channel": lc_in, "cache_last_time": lt_in,
                       "cache_last_channel_len": np.array([len_in], np.int64)},
            "outputs": {"encoder_output": enc.astype(np.float32),
                        "encoded_lengths": np.array([vlen], np.int64),
                        "cache_last_channel_out": lc,
                        "cache_last_time_out": lt,
                        "cache_last_channel_len_out": np.array([cache_len], np.int64)},
        }


def gen_tdt_trace(cfg, oracle, total_frames, feats_seed, out_path, topk=0):
    from trt_asr_tpu.decode import tdt_greedy_decode_host

    rng = np.random.default_rng(feats_seed)
    feats = (0.5 * rng.standard_normal((1, total_frames, cfg.feat_in))).astype(np.float32)
    enc, enc_len = oracle.offline_encode(feats, np.array([total_frames]))
    t = int(enc_len[0])

    h0 = np.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden), np.float32)
    g, h, c = oracle.predictor(np.array([[cfg.blank_id]]), h0, h0)

    def joint_fn(enc_t, gg):
        return oracle.joint(enc_t[None, None], gg[None, None])[0, 0, 0]

    def pred_fn(tok, st):
        hh, cc = st
        gg, h2, c2 = oracle.predictor(np.array([[tok]]), hh, cc)
        return gg[0, 0], (h2, c2)

    trace = []
    toks, _, _, _ = tdt_greedy_decode_host(
        enc[0, :t], joint_fn, pred_fn, (h, c), g[0, 0], cfg.blank_id,
        blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values,
        max_symbols=cfg.max_symbols_per_timestep, trace=trace,
        trace_topk=topk)
    with open(out_path, "w") as f:
        f.write(json.dumps({"type": "meta", "blank_id": cfg.blank_id,
                            "t_enc": t, "emitted": toks,
                            "duration_values": list(cfg.duration_values)}) + "\n")
        for rec in trace:
            f.write(json.dumps(rec) + "\n")
    return len(trace)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--config", default="tiny", choices=["tiny", "full"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--feats-seed", type=int, default=0)
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--trace", action="store_true", help="also write tdt_trace.jsonl")
    ap.add_argument("--trace-topk", type=int, default=0,
                    help="include per-step top-k token logits + logsumexp in "
                         "the trace (reference tdt_trace.py / "
                         "PARAKEET_DEBUG_JOINT_TOPK)")
    args = ap.parse_args()

    cfg, _params, oracle = _load(args)
    os.makedirs(args.out_dir, exist_ok=True)
    # total frames to yield ~args.chunks chunks
    first_shift, steady_shift = cfg.shift_size_frames
    total = first_shift + steady_shift * (args.chunks - 1) + cfg.chunk_size_frames[1] // 2
    p = os.path.join(args.out_dir, "streaming_encoder_reference.jsonl")
    n = write_jsonl(p, gen_streaming_records(cfg, oracle, total, args.feats_seed))
    print(f"streaming goldens: {n - 1} chunks -> {p}")
    if args.trace:
        tp = os.path.join(args.out_dir, "tdt_trace.jsonl")
        steps = gen_tdt_trace(cfg, oracle, min(total, 300), args.feats_seed, tp,
                              topk=args.trace_topk)
        print(f"tdt trace: {steps} steps -> {tp}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
