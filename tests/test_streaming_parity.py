"""Streaming encoder parity: closed-loop JAX-vs-oracle over the chunk
schedule, with valid-region masking — the core test of the reference's
methodology (SURVEY §4: functional + closed-loop golden comparison,
tools/onnxruntime/onnx_streaming_parity.py semantics).

Covers: two-regime schedule (41 / 57-frame chunks), drop_extra_pre_encoded,
cache growth +valid_out_len per chunk, cache saturation (tiny cache size 32
saturates mid-test), short final chunk with keep_all, and the contract
layout round-trip (right-aligned internal <-> left-aligned contract state).
"""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import encode, init_encoder_state, init_params, offline_encode
from trt_asr_tpu.models.parakeet.encoder import state_from_contract, state_to_contract
from trt_asr_tpu.streaming import build_schedule

ATOL = 2e-4


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=2)
    from oracle.torch_parakeet import TorchParakeet

    return cfg, params, TorchParakeet(cfg, params)


def _pad_chunk(feats, spec):
    """Slice per schedule and zero-pad to the static program shape."""
    x = feats[spec.slice_start : spec.slice_end]
    if x.shape[0] < spec.frames:
        x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
    return x[None], spec.valid_frames


def test_schedule_shapes():
    cfg = ModelConfig.tiny()
    sched = build_schedule(200, cfg)
    assert sched[0].slice_start == 0 and sched[0].slice_end == 41 and sched[0].drop_extra == 0
    assert sched[1].slice_start == 8 and sched[1].slice_end == 65 and sched[1].drop_extra == 2
    assert sched[2].slice_start == 32 and sched[2].slice_end == 89
    # valid outputs tile contiguously: chunk k covers frames [24k, 24k+24)
    for k, spec in enumerate(sched[:-1]):
        assert spec.start == (0 if k == 0 else 17 + 24 * (k - 1))
    assert sched[-1].is_last


def test_closed_loop_streaming_parity(setup, rng):
    cfg, params, oracle = setup
    total = 350  # ends with a short final chunk; cache (32) saturates mid-run
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total, cfg)
    assert len(sched) >= 8

    # JAX closed loop (internal right-aligned state)
    state = init_encoder_state(cfg, 1)
    # Oracle closed loop (contract-layout caches)
    lc = np.zeros((1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32)
    lt = np.zeros((1, cfg.num_layers, cfg.d_model, cfg.conv_context_size), np.float32)
    cache_len = 0

    saturated = False
    for spec in sched:
        x, valid = _pad_chunk(feats, spec)
        cache_drop = 0 if spec.is_last else cfg.cache_drop_size
        enc_j, len_j, state = encode(
            params, cfg, x, np.array([valid], np.int32), state,
            drop_extra=spec.drop_extra, cache_drop=cache_drop)
        enc_j, len_j = np.asarray(enc_j), int(np.asarray(len_j)[0])

        enc_t, len_t, lc, lt, cache_len = oracle.streaming_step(
            x, valid, lc, lt, cache_len, spec.drop_extra, keep_all=spec.is_last)

        assert len_j == len_t, f"chunk {spec.idx}: len {len_j} != {len_t}"
        if not spec.is_last:
            assert len_j == cfg.valid_out_len
        np.testing.assert_allclose(
            enc_j[0, :len_j], enc_t[0], atol=ATOL, rtol=1e-4,
            err_msg=f"chunk {spec.idx} encoder output mismatch")

        # cache parity in contract layout, valid region only
        cstate = state_to_contract(state)
        jl = int(np.asarray(cstate["cache_last_channel_len"])[0])
        assert jl == cache_len, f"chunk {spec.idx}: cache_len {jl} != {cache_len}"
        np.testing.assert_allclose(
            np.asarray(cstate["cache_last_channel"])[0, :, :jl], lc[0, :, :jl],
            atol=ATOL, rtol=1e-4, err_msg=f"chunk {spec.idx} cache_last_channel")
        np.testing.assert_allclose(
            np.asarray(cstate["cache_last_time"])[0], lt[0],
            atol=ATOL, rtol=1e-4, err_msg=f"chunk {spec.idx} cache_last_time")
        if cache_len == cfg.att_cache_size:
            saturated = True
    assert saturated, "test should cover cache saturation"


def test_cache_usefulness_ab(setup, rng):
    """A/B: threaded cache vs reset cache must differ (the reference's
    cache-usefulness test, streaming_encoder_cache.py:672-688)."""
    cfg, params, oracle = setup
    total = 113
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total, cfg)
    state = init_encoder_state(cfg, 1)
    outs = []
    for spec in sched[:-1]:
        x, valid = _pad_chunk(feats, spec)
        enc, ln, state = encode(params, cfg, x, np.array([valid], np.int32), state,
                                drop_extra=spec.drop_extra, cache_drop=cfg.cache_drop_size)
        outs.append((x, valid, spec, np.asarray(enc)))
    # re-run the last processed chunk with a fresh (zero) cache
    x, valid, spec, threaded = outs[-1]
    fresh, _, _ = encode(params, cfg, x, np.array([valid], np.int32),
                         init_encoder_state(cfg, 1),
                         drop_extra=spec.drop_extra, cache_drop=cfg.cache_drop_size)
    diff = np.abs(np.asarray(fresh) - threaded).max()
    assert diff > 1e-3, f"cache appears unused (diff={diff})"


def test_state_contract_roundtrip(setup, rng):
    cfg, params, _ = setup
    state = init_encoder_state(cfg, 2)
    # run two chunks to get a partially-filled cache
    feats = (0.5 * rng.standard_normal((2, 41, cfg.feat_in))).astype(np.float32)
    _, _, state = encode(params, cfg, feats, np.array([41, 30], np.int32), state,
                         drop_extra=0, cache_drop=cfg.cache_drop_size)
    c = state_to_contract(state)
    assert c["cache_last_channel"].shape == (2, cfg.num_layers, cfg.att_cache_size, cfg.d_model)
    assert c["cache_last_time"].shape == (2, cfg.num_layers, cfg.d_model, cfg.conv_context_size)
    rt = state_from_contract(c, params)
    np.testing.assert_allclose(np.asarray(rt.att_cache), np.asarray(state.att_cache), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rt.time_cache), np.asarray(state.time_cache), atol=1e-6)
    # derived kv cache reconstructs exactly from the raw cache
    np.testing.assert_allclose(np.asarray(rt.kv_cache), np.asarray(state.kv_cache), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(rt.cache_len), np.asarray(state.cache_len))
