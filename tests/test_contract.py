import dataclasses

import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.contract import load_contract


def test_contract_loads_and_validates():
    c = load_contract()
    assert c.model_id == "parakeet-tdt-0.6b-v3"
    assert c.validate() == []


def test_contract_values_match_reference():
    """Spot-check the canonical numbers from the reference contract."""
    c = load_contract()
    assert c.frontend.sample_rate_hz == 16000
    assert c.frontend.n_fft == 512
    assert c.frontend.n_mels == 128
    assert c.frontend.hop_length == 160
    assert c.frontend.win_length == 400
    assert c.tokenizer.vocab_size == 8192
    assert c.tokenizer.blank_id == 8192
    assert c.encoder.num_layers == 24
    assert c.encoder.d_model == 1024
    assert c.encoder.n_heads == 8
    assert c.encoder.conv_kernel_size == 9
    assert c.encoder.subsampling.factor == 8
    assert c.predictor.pred_hidden == 640
    assert c.predictor.pred_rnn_layers == 2
    assert c.joint.joint_vocab_size == 8198
    assert c.joint.duration_values == (0, 1, 2, 3, 4)
    assert c.decode.max_symbols_per_timestep == 8
    assert c.streaming.valid_out_len == 3
    assert c.streaming.cache_drop_size == 3
    assert c.streaming.cache_last_channel_size == 256
    assert c.streaming.cache_time_context_size == 4
    assert c.streaming.chunk_size_frames == (41, 48)
    assert c.streaming.shift_size_frames == (17, 24)


def test_model_config_from_contract():
    c = load_contract()
    mc = ModelConfig.from_contract(c)
    assert mc.d_model == 1024
    assert mc.blank_id == 8192
    assert mc.joint_vocab_size == 8198
    assert mc.head_dim == 128
    assert mc.conv_context_size == 4
    assert mc.stride_stages == 3


def test_tiny_config_invariants():
    mc = ModelConfig.tiny()
    assert mc.subsampling_factor == 2 ** mc.stride_stages
    assert mc.joint_vocab_size == mc.vocab_size + 1 + len(mc.duration_values)
    assert mc.d_model % mc.n_heads == 0


def test_reference_env_aliases(monkeypatch):
    """The reference's exact env names must steer RuntimeConfig
    (operational parity: docs/DEBUGGING.md table)."""
    from trt_asr_tpu.config import RuntimeConfig

    monkeypatch.setenv("PARAKEET_DISABLE_PUNCT_SUPPRESSION", "1")
    monkeypatch.setenv("PARAKEET_EMIT_FINAL_EACH_CHUNK", "1")
    monkeypatch.setenv("PARAKEET_JOINT_DUR_FIRST", "1")
    monkeypatch.setenv("PARAKEET_DEBUG_BLANK_SCAN", "1")
    rt = RuntimeConfig.from_env()
    assert rt.suppress_leading_punct is False
    assert rt.final_on_push is True
    assert rt.joint_dur_first is True
    assert rt.debug_blank_scan is True


def test_tolerance_rung_ladder():
    """The contract defines a tolerance LADDER (reference contract.json
    tolerances block: ORT all-chunk atol / TRT-fp32 p95+p100 / fp16 p95);
    rung_verdicts must report the strictest rung cleared."""
    from trt_asr_tpu.contract import load_contract

    tol = load_contract().tolerances

    v = tol.rung_verdicts([1e-6] * 50)
    assert v["best_rung"] == "ort_f32"
    assert all(r["pass"] for r in v["rungs"].values())

    # 3e-4 floor (the r2 full-size f32-HIGH case): fails ORT, passes TRT-fp32
    v = tol.rung_verdicts([2.9e-4] * 30)
    assert v["best_rung"] == "trt_fp32"
    assert not v["rungs"]["ort_f32"]["pass"]
    assert v["rungs"]["trt_fp32"]["pass"] and v["rungs"]["trt_fp16"]["pass"]

    # bf16-class error: only the fp16 rung
    v = tol.rung_verdicts([1.2e-3] * 30)
    assert v["best_rung"] == "trt_fp16"
    assert not v["rungs"]["trt_fp32"]["pass"]

    # one outlier chunk above p100 kills trt_fp32 even with a clean p95
    errs = [1e-5] * 99 + [2e-3]
    v = tol.rung_verdicts(errs)
    assert not v["rungs"]["trt_fp32"]["pass"]
    assert v["best_rung"] == "trt_fp16"

    v = tol.rung_verdicts([5e-2] * 10)
    assert v["best_rung"] is None
