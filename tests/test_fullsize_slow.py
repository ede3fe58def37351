"""Full-size (0.6B) smoke tests — slow, opt-in:

    python -m pytest tests/test_fullsize_slow.py -m slow --override-ini addopts=

Covers the full-dimension code paths the tiny config can't: 24-layer scan,
128-mel subsampling to 16 freq bins, 8192-vocab decode, 8198 joint head.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def full():
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet import init_params

    cfg = ModelConfig()
    return cfg, init_params(cfg, seed=0)


def test_full_size_streaming_chunk_and_decode(full):
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.streaming.session import _session_step

    cfg, params = full
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 57, cfg.feat_in)).astype(np.float32)
    enc_state = init_encoder_state(cfg, 1)
    dec_state = init_decode_state(cfg, 1)
    toks, n, enc_state, dec_state = _session_step(
        params, cfg, feats, np.int32(57), enc_state, dec_state,
        drop_extra=2, cache_drop=3, blank_penalty=0.0,
        emitted_so_far=np.int32(0), punct_mask=None, use_punct_mask=False)
    # buffer sized max_symbols x post-drop encoder steps (57 frames -> 8 - 2 = 6)
    assert toks.shape[0] == cfg.max_symbols_per_timestep * 6
    assert 0 <= int(n) <= toks.shape[0]
    assert int(np.asarray(enc_state.cache_len)[0]) == 3
    att = np.asarray(enc_state.att_cache)
    assert att.shape == (24, 1, 256, 1024)
    assert np.isfinite(att).all()


def test_full_size_streaming_oracle_parity(full):
    """Two full-size streaming chunks closed-loop vs the torch oracle."""
    import numpy as np

    from oracle.torch_parakeet import TorchParakeet
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state
    from trt_asr_tpu.streaming import build_schedule

    cfg, params = full
    oracle = TorchParakeet(cfg, params)
    rng = np.random.default_rng(2)
    total = 72  # chunk 0 (41f) + chunk 1 (57f window)
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = [s for s in build_schedule(total, cfg)][:2]

    state = init_encoder_state(cfg, 1)
    lc = np.zeros((1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32)
    lt = np.zeros((1, cfg.num_layers, cfg.d_model, cfg.conv_context_size), np.float32)
    cache_len = 0
    for spec in sched:
        x = feats[max(spec.slice_start, 0):spec.slice_end]
        valid = x.shape[0]
        if x.shape[0] < spec.frames:
            x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
        enc_j, len_j, state = encode(params, cfg, x[None],
                                     np.array([valid], np.int32), state,
                                     drop_extra=spec.drop_extra,
                                     cache_drop=cfg.cache_drop_size)
        enc_t, len_t, lc, lt, cache_len = oracle.streaming_step(
            x[None], valid, lc, lt, cache_len, spec.drop_extra)
        v = int(len_t)
        assert int(np.asarray(len_j)[0]) == v
        np.testing.assert_allclose(np.asarray(enc_j)[0, :v], enc_t[0],
                                   atol=2e-4, rtol=1e-4,
                                   err_msg=f"full-size chunk {spec.idx}")


def test_full_size_component_oracle_parity(full):
    """One full-size chunk vs the torch oracle at contract tolerance."""
    from oracle.torch_parakeet import TorchParakeet
    from trt_asr_tpu.models.parakeet import offline_encode

    cfg, params = full
    oracle = TorchParakeet(cfg, params)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 41, cfg.feat_in)).astype(np.float32)
    enc_j, len_j = offline_encode(params, cfg, feats, np.array([41], np.int32))
    enc_t, len_t = oracle.offline_encode(feats, np.array([41]))
    v = int(np.asarray(len_j)[0])
    assert v == int(len_t[0]) == 6
    np.testing.assert_allclose(np.asarray(enc_j)[0, :v], enc_t[0, :v],
                               atol=1e-4, rtol=1e-4)


def test_full_size_encoder_graph_exec_parity(full, tmp_path):
    """The EXECUTABLE encoder.onnx must hold at the real 0.6B dimensions:
    export at a static 57-frame window, run the 24-layer graph in the
    pure-numpy interpreter (tools/onnx_exec.py), match offline_encode.
    Full-size catches head-count/reshape/flatten-order mistakes the tiny
    config's round numbers can mask."""
    import os
    import sys

    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.onnx_exec import run_graph

    from trt_asr_tpu.io.onnx_lite import read_onnx
    from trt_asr_tpu.io.onnx_weights import export_params_to_onnx
    from trt_asr_tpu.models.parakeet import offline_encode

    cfg, params = full
    t_in = 57
    out = str(tmp_path / "export")
    export_params_to_onnx(jax.tree.map(np.asarray, params), cfg, out,
                          external_threshold=1 << 20, encoder_t_in=t_in)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, t_in, cfg.feat_in)).astype(np.float32)
    got = run_graph(read_onnx(os.path.join(out, "encoder.onnx")), {
        "audio_signal": np.transpose(feats, (0, 2, 1)),
        "length": np.array([t_in], np.int64)})

    enc, out_len = offline_encode(params, cfg, feats,
                                  np.array([t_in], np.int32))
    t_enc = int(np.asarray(out_len)[0])
    assert got["encoded_lengths"][0] == t_enc
    np.testing.assert_allclose(
        got["encoder_output"],
        np.transpose(np.asarray(enc)[:, :t_enc], (0, 2, 1)),
        atol=2e-4)  # 24 layers of f32 accumulation-order noise
