"""Full-pipeline ONNX export executability: the pure-numpy closed-loop
streaming transcriber (tools/onnx_pipeline.py — encoder_streaming.onnx +
predictor.onnx + joint.onnx + a numpy TDT loop, no JAX/torch/model code)
must be TOKEN-EXACT vs the JAX StreamingSession on the same feature stream,
including a short flush chunk (exercising the in-graph `length` masking)
and attention-cache saturation.

This is the full-pipeline analog of the reference's ORT streaming parity
harness (tools/onnxruntime/onnx_streaming_parity.py:178-230), which drove
its exported graphs closed loop under ORT as the op-level-independent
second implementation.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.io.onnx_weights import export_params_to_onnx
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.schedule import ChunkScheduler
from trt_asr_tpu.streaming.session import StreamingSession


@pytest.fixture(scope="module")
def model():
    # tiny cache capacity saturates within the test's chunk count
    return ParakeetTDT.random(ModelConfig.tiny(att_cache_size=8), seed=21)


@pytest.fixture(scope="module")
def export_dir(model, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("onnx_export"))
    export_params_to_onnx(jax.tree.map(np.asarray, model.params), model.cfg,
                          out, external_threshold=None, encoder_t_in=57,
                          prompt_ids=model.prompt_ids)
    return out


def _session_tokens(model, feats, pushes):
    sess = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    sess._sched = ChunkScheduler(model.cfg, unified=True)  # pipeline profile
    for lo, hi in pushes:
        sess.push_features(feats[lo:hi])
    sess.finalize()
    return list(sess._tokens)


def test_pipeline_token_exact_vs_session(model, export_dir):
    from tools.onnx_pipeline import OnnxStreamingPipeline

    cfg = model.cfg
    rng = np.random.default_rng(3)
    # 7 steady chunks + a deliberately short flush chunk (total not aligned
    # to the shift grid) — saturates the size-8 attention cache and ends on
    # a masked short window
    total = cfg.chunk_size_frames[0] + 7 * cfg.shift_size_frames[1] + 11
    feats = rng.standard_normal((total, cfg.feat_in)).astype(np.float32)

    want = _session_tokens(model, feats,
                           [(0, 100), (100, 130), (130, total)])
    assert want, "degenerate test: session emitted nothing"

    # no prompt_ids argument: the pipeline must pick them up from the
    # export's model_meta (self-contained-dir claim)
    pipe = OnnxStreamingPipeline(export_dir)
    # different push granularity: the transcript must be invariant to it
    for s in range(0, total, 53):
        pipe.push_features(feats[s: s + 53])
    pipe.finalize()
    assert pipe.tokens == want

    # reset() must give an identical second utterance (state fully cleared)
    pipe.reset()
    pipe.push_features(feats)
    pipe.finalize()
    assert pipe.tokens == want


def test_pipeline_shift_smaller_than_pre_encode(tmp_path):
    """Regimes where shift < pre_encode context (the NeMo-default regime
    has shift 8 < pre 9) make the steady slice start negative — the
    pipeline must left-pad zeros like the runtime's extract_chunk instead
    of wrapping a negative python index (r3 review finding)."""
    from tools.onnx_pipeline import OnnxStreamingPipeline

    cfg = ModelConfig.tiny(att_cache_size=8, shift_size_frames=(8, 8),
                           valid_out_len=1, cache_drop_size=5)
    model = ParakeetTDT.random(cfg, seed=33)
    rng = np.random.default_rng(9)
    total = cfg.chunk_size_frames[0] + 5 * cfg.shift_size_frames[1] + 5
    feats = rng.standard_normal((total, cfg.feat_in)).astype(np.float32)

    want = _session_tokens(model, feats, [(0, total)])

    out = str(tmp_path / "export")
    export_params_to_onnx(jax.tree.map(np.asarray, model.params), cfg, out,
                          external_threshold=None, encoder_t_in=57,
                          prompt_ids=model.prompt_ids)
    pipe = OnnxStreamingPipeline(out)
    pipe.push_features(feats)
    pipe.finalize()
    assert pipe.tokens == want


def test_pipeline_trained_gate_model(tmp_path):
    """The committed WER-gate model (artifacts/models/gate_r3, trained to
    0% WER on its synthetic task) must transcribe through the pure-ONNX
    pipeline token-exactly vs the runtime session — trained weights + real
    text, not just random-parameter parity."""
    from tools.onnx_pipeline import OnnxStreamingPipeline
    from tools.train_synthetic_e2e import synth_utterance
    from trt_asr_tpu.frontend import StreamingLogMel

    model_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                             "artifacts", "models", "gate_r3")
    model = ParakeetTDT.from_model_dir(model_dir)
    rng = np.random.default_rng(42)
    word_ids = [17, 602, 88, 1040, 3]
    audio = synth_utterance(word_ids, rng)

    sess = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    sess._sched = ChunkScheduler(model.cfg, unified=True)
    sess.push_audio(audio)
    sess.finalize()
    want = list(sess._tokens)
    assert len(want) == len(word_ids), \
        f"gate model regressed: {sess.text!r} for words {word_ids}"

    out = str(tmp_path / "gate_export")
    export_params_to_onnx(jax.tree.map(np.asarray, model.params), model.cfg,
                          out, external_threshold=None, encoder_t_in=57,
                          prompt_ids=model.prompt_ids)
    feats = StreamingLogMel(model.frontend).push(audio)
    pipe = OnnxStreamingPipeline(out)
    pipe.push_features(np.asarray(feats))
    pipe.finalize()
    assert pipe.tokens == want
    assert model.tokenizer.decode(pipe.tokens) == sess.text


def test_pipeline_flush_masking_matters(model, export_dir):
    """The short-flush in-graph masking must actually be load-bearing:
    feeding the flush window with length=window (pretending the zero-padded
    tail is valid) has to change the encoder output on some tail step.
    Guards against the masks silently becoming constants."""
    import json

    from tools.onnx_exec import run_graph
    from trt_asr_tpu.io.onnx_lite import read_onnx

    cfg = model.cfg
    g = read_onnx(os.path.join(export_dir, "encoder_streaming.onnx"))
    with open(os.path.join(export_dir, "model_meta.json")) as f:
        meta = json.load(f)
    window = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    rng = np.random.default_rng(5)
    x = np.zeros((1, cfg.feat_in, window), np.float32)
    valid = window - 16
    x[:, :, :valid] = rng.standard_normal((1, cfg.feat_in, valid))
    cache = {
        "cache_last_channel": rng.standard_normal(
            (1, cfg.num_layers, meta["streaming"]["att_cache_size"],
             cfg.d_model)).astype(np.float32),
        "cache_last_time": rng.standard_normal(
            (1, cfg.num_layers, cfg.d_model,
             cfg.conv_context_size)).astype(np.float32),
        "cache_last_channel_len": np.array([4], np.int64),
    }
    short = run_graph(g, {"audio_signal": x,
                          "length": np.array([valid], np.int64), **cache})
    full = run_graph(g, {"audio_signal": x,
                         "length": np.array([window], np.int64), **cache})
    t_short = int(short["encoded_lengths"][0])
    assert t_short < int(full["encoded_lengths"][0])
    # the masked run must differ from the unmasked run on the valid steps
    # (the zero tail leaks through attention/conv when unmasked)
    d = np.abs(short["encoder_output"][0, :, :t_short]
               - full["encoder_output"][0, :, :t_short]).max()
    assert d > 1e-6


def test_pipeline_short_flush_matches_runtime_encoder(model, export_dir):
    """Direct numeric check of the flush path: a short window through the
    graph (length < window) must match the runtime encoder fed the same
    valid count at 1e-4 on the emitted steps — the chunk-level analog of
    the closed-loop test, at the one shape that test never covers."""
    import jax.numpy as jnp

    from tools.onnx_exec import run_graph
    from trt_asr_tpu.io.onnx_lite import read_onnx
    from trt_asr_tpu.models.parakeet.encoder import encode, init_encoder_state

    cfg = model.cfg
    g = read_onnx(os.path.join(export_dir, "encoder_streaming.onnx"))
    window = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    rng = np.random.default_rng(11)
    valid = window - 13
    win = np.zeros((window, cfg.feat_in), np.float32)
    win[:valid] = rng.standard_normal((valid, cfg.feat_in))

    state = init_encoder_state(cfg, 1)
    enc, out_len, _ = encode(
        model.params, cfg, jnp.asarray(win[None]),
        jnp.asarray([valid], jnp.int32), state,
        drop_extra=cfg.drop_extra_pre_encoded, cache_drop=0, valid_cap=None)

    got = run_graph(g, {
        "audio_signal": win.T[None], "length": np.array([valid], np.int64),
        "cache_last_channel": np.zeros(
            (1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32),
        "cache_last_time": np.zeros(
            (1, cfg.num_layers, cfg.d_model, cfg.conv_context_size),
            np.float32),
        "cache_last_channel_len": np.zeros((1,), np.int64)})
    t_post = int(got["encoded_lengths"][0])
    assert t_post == int(out_len[0])
    np.testing.assert_allclose(got["encoder_output"][0].T[:t_post],
                               np.asarray(enc)[0, :t_post], atol=1e-4)
