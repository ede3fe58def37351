#!/usr/bin/env python3
"""Runtime smoke tool (reference apps/trt_runtime_smoke: deserialize an
engine, print bindings/dtypes/shapes, run one inference): loads a model
dir, prints component IO signatures + parameter stats, runs one chunk
end-to-end, reports timing.

    python tools/runtime_smoke.py --model-dir DIR [--platform cpu|tpu|env]
    python tools/runtime_smoke.py --synthetic tiny
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--synthetic", default="", choices=["", "tiny", "full"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.models.parakeet.params import num_params
    from trt_asr_tpu.streaming.session import _session_step

    if args.model_dir:
        model = ParakeetTDT.from_model_dir(args.model_dir)
    else:
        cfg = ModelConfig.tiny() if (args.synthetic or "tiny") == "tiny" else ModelConfig()
        model = ParakeetTDT.random(cfg)
    cfg = model.cfg

    print(f"device: {jax.devices()[0]}")
    print(f"model: {num_params(model.params):,} params, vocab {len(model.tokenizer)}")
    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    print("component IO (contract):")
    print(f"  encoder.streaming  audio[B,{frames},{cfg.feat_in}] + "
          f"cache_last_channel[B,{cfg.num_layers},{cfg.att_cache_size},{cfg.d_model}] + "
          f"cache_last_time[B,{cfg.num_layers},{cfg.d_model},{cfg.conv_context_size}] + len[B]")
    print(f"  predictor          y[B,U] h/c[{cfg.pred_rnn_layers},B,{cfg.pred_hidden}] "
          f"-> g[B,U,{cfg.pred_hidden}]")
    print(f"  joint              -> logits[..., {cfg.joint_vocab_size}] "
          f"(tokens {cfg.token_head_size} ++ durations {cfg.num_duration_bins})")

    enc_state = init_encoder_state(cfg, 1)
    dec_state = init_decode_state(cfg, 1)
    feats = np.random.default_rng(0).standard_normal((1, frames, cfg.feat_in)).astype(np.float32)
    t0 = time.time()
    toks, n, enc_state, dec_state = _session_step(
        model.params, cfg, feats, np.int32(frames), enc_state, dec_state,
        drop_extra=cfg.drop_extra_pre_encoded, cache_drop=cfg.cache_drop_size,
        blank_penalty=0.0, emitted_so_far=np.int32(0),
        punct_mask=None, use_punct_mask=False)
    n = int(n)
    compile_s = time.time() - t0
    t0 = time.time()
    feats2 = feats * 1.01
    toks, n2, enc_state, dec_state = _session_step(
        model.params, cfg, feats2, np.int32(frames), enc_state, dec_state,
        drop_extra=cfg.drop_extra_pre_encoded, cache_drop=cfg.cache_drop_size,
        blank_penalty=0.0, emitted_so_far=np.int32(n),
        punct_mask=None, use_punct_mask=False)
    _ = np.asarray(toks)
    step_ms = (time.time() - t0) * 1e3
    cl = int(np.asarray(enc_state.cache_len)[0])
    print(f"one chunk: compile+run {compile_s:.1f}s, second step {step_ms:.1f} ms, "
          f"{n} tokens, cache_len {cl}")
    print("SMOKE OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
