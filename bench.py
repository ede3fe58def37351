"""Benchmark: full-size streaming chunk step (encoder + fused TDT decode).

Headline metric vs the reference's best number (BASELINE.md): TRT FP16
streaming-encoder per-chunk latency p50 17.3 ms / mean 18.8 ms on a laptop
NVIDIA GPU for a 480 ms audio chunk. Ours measures the SAME work plus the
decode loop (which the reference ran on the host with per-step D2H), on one
TPU chip, bf16 encoder / f32 decode.

Prints exactly ONE JSON line on stdout:
  {"metric": "streaming_chunk_p50_ms", "value": ..., "unit": "ms",
   "vs_baseline": <baseline 18.8 / ours>}
Extra detail goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="measure batched multi-stream throughput at B streams "
                         "instead of single-stream latency")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state, tdt_greedy_decode_chunk  # noqa: F401
    from trt_asr_tpu.models.parakeet import init_encoder_state, init_params
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.streaming.session import _session_step

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    if args.batch:
        return _bench_batch(args.batch, args.iters)

    cfg = ModelConfig()
    t0 = time.time()
    params = cast_params_for_compute(init_params(cfg, seed=0), jnp.bfloat16)
    params = jax.device_put(params)
    print(f"params init+put: {time.time()-t0:.1f}s", file=sys.stderr)

    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]   # 57
    enc_state = init_encoder_state(cfg, 1, dtype=jnp.bfloat16)
    dec_state = init_decode_state(cfg, 1)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, frames, cfg.feat_in)).astype(np.float32))
    valid = jnp.int32(frames)

    def step(enc_state, dec_state):
        return _session_step(
            params, cfg, feats, valid, enc_state, dec_state,
            drop_extra=cfg.drop_extra_pre_encoded, cache_drop=cfg.cache_drop_size,
            blank_penalty=0.0, emitted_so_far=jnp.int32(0),
            punct_mask=None, use_punct_mask=False)

    # compile + warmup
    t0 = time.time()
    toks, n, enc_state, dec_state = step(enc_state, dec_state)
    jax.block_until_ready(enc_state.att_cache)
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)
    for _ in range(5):
        toks, n, enc_state, dec_state = step(enc_state, dec_state)
    jax.block_until_ready(enc_state.att_cache)

    iters = 100
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        toks, n, enc_state, dec_state = step(enc_state, dec_state)
        jax.block_until_ready(toks)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p50, p95, mean = (float(np.percentile(lat, 50)), float(np.percentile(lat, 95)),
                      float(lat.mean()))
    chunk_audio_ms = cfg.shift_size_frames[1] * 10.0     # 240 ms of new audio/chunk
    rtf = p50 / chunk_audio_ms
    streams = chunk_audio_ms / p50
    print(f"p50={p50:.3f} ms p95={p95:.3f} mean={mean:.3f} "
          f"(chunk advances {chunk_audio_ms:.0f} ms audio; RTF={rtf:.4f}; "
          f"~{streams:.0f} real-time streams/chip serially)", file=sys.stderr)

    baseline_ms = 18.8  # TRT FP16 per-chunk mean, reference BASELINE.md
    print(json.dumps({
        "metric": "streaming_chunk_p50_ms",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / p50, 2),
    }))
    return 0


def _bench_batch(b: int, iters: int) -> int:
    """Batched multi-stream streaming step: throughput in real-time streams
    per chip (each step advances every stream by 240 ms of audio)."""
    import jax
    import jax.numpy as jnp

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state, init_params
    from trt_asr_tpu.models.parakeet.params import cast_params_for_compute
    from trt_asr_tpu.streaming.batch_engine import _batch_step

    cfg = ModelConfig()
    params = jax.device_put(cast_params_for_compute(init_params(cfg, seed=0), jnp.bfloat16))
    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    enc_state = init_encoder_state(cfg, b, dtype=jnp.bfloat16)
    dec_state = init_decode_state(cfg, b)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((b, frames, cfg.feat_in)).astype(np.float32))
    valid = jnp.full((b,), frames, jnp.int32)
    emitted = jnp.zeros((b,), jnp.int32)
    max_tokens = cfg.max_symbols_per_timestep * (frames // cfg.subsampling_factor + 1)

    def step(es, ds):
        return _batch_step(params, cfg, feats, valid, es, ds, emitted,
                           drop_extra=cfg.drop_extra_pre_encoded,
                           cache_drop=cfg.cache_drop_size, max_tokens=max_tokens)

    t0 = time.time()
    toks, n, enc_state, dec_state = step(enc_state, dec_state)
    jax.block_until_ready(toks)
    print(f"compile+first step: {time.time()-t0:.1f}s", file=sys.stderr)
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        toks, n, enc_state, dec_state = step(enc_state, dec_state)
        jax.block_until_ready(toks)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.asarray(lat)
    p50 = float(np.percentile(lat, 50))
    chunk_audio_ms = cfg.shift_size_frames[1] * 10.0
    streams = b * chunk_audio_ms / p50
    print(f"B={b}: p50={p50:.3f} ms/step p95={np.percentile(lat,95):.3f} "
          f"-> {streams:.0f} real-time streams/chip", file=sys.stderr)
    print(json.dumps({
        "metric": f"streaming_realtime_streams_per_chip_b{b}",
        "value": round(streams, 1),
        "unit": "streams",
        "vs_baseline": round(streams / 12.8, 2),   # ref: 240ms/18.8ms = 12.8 streams
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
