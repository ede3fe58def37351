"""Component parity ladder, rung 1: JAX (CPU f32) vs torch oracle.

Mirrors the reference's golden-reference methodology (SURVEY §4): each
component compared at the contract's CPU tolerance (atol/rtol 1e-4;
reference contract trt.tolerances.ort). Tiny config for speed; the same
checks run at full size under -m slow.
"""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import (
    init_params,
    offline_encode,
    predictor_sequence,
)
from trt_asr_tpu.models.parakeet.joint import joint_apply, joint_single_step
from trt_asr_tpu.models.parakeet.predictor import init_predictor_state, predictor_step

ATOL = 1e-4
RTOL = 1e-4


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=1)
    from oracle.torch_parakeet import TorchParakeet

    oracle = TorchParakeet(cfg, params)
    return cfg, params, oracle


def test_pre_encode_parity(setup, rng):
    cfg, params, oracle = setup
    feats = rng.standard_normal((2, 48, cfg.feat_in)).astype(np.float32)
    import jax.numpy as jnp
    from trt_asr_tpu.ops.conv import dw_striding_subsample, subsampled_length

    ours = np.asarray(dw_striding_subsample(params["encoder"]["pre_encode"], jnp.asarray(feats)))
    import torch

    ref = oracle.pre_encode(torch.from_numpy(feats)).detach().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)
    # length arithmetic: 48 -> 6 at factor 8 with (n-1)//2+1 per stage
    assert int(np.asarray(subsampled_length(jnp.asarray([48]), cfg.stride_stages))[0]) == 6
    assert oracle.sub_length(48) == 6
    assert oracle.sub_length(41) == 6
    assert oracle.sub_length(57) == 8


def test_offline_encoder_parity(setup, rng):
    cfg, params, oracle = setup
    b, t = 2, 48
    feats = rng.standard_normal((b, t, cfg.feat_in)).astype(np.float32)
    lengths = np.array([48, 33], np.int32)
    enc_j, len_j = offline_encode(params, cfg, feats, lengths)
    enc_j, len_j = np.asarray(enc_j), np.asarray(len_j)
    enc_t, len_t = oracle.offline_encode(feats, lengths)
    assert enc_j.shape == enc_t.shape
    np.testing.assert_array_equal(len_j, len_t)
    for bi in range(b):
        v = int(len_j[bi])
        np.testing.assert_allclose(enc_j[bi, :v], enc_t[bi, :v], atol=ATOL, rtol=RTOL)


def test_predictor_parity(setup, rng):
    cfg, params, oracle = setup
    b, u = 2, 5
    y = rng.integers(0, cfg.vocab_size, size=(b, u)).astype(np.int32)
    h0, c0 = init_predictor_state(cfg, b)
    g_j, h_j, c_j = predictor_sequence(params["predictor"], y, h0, c0)
    g_t, h_t, c_t = oracle.predictor(y, np.asarray(h0), np.asarray(c0))
    np.testing.assert_allclose(np.asarray(g_j), g_t, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(h_j), h_t, atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(c_j), c_t, atol=ATOL, rtol=RTOL)


def test_predictor_blank_embeds_zero(setup):
    cfg, params, _ = setup
    emb = np.asarray(params["predictor"]["embed"])
    np.testing.assert_array_equal(emb[cfg.blank_id], 0.0)


def test_predictor_step_matches_sequence(setup, rng):
    cfg, params, _ = setup
    b = 2
    y = rng.integers(0, cfg.vocab_size, size=(b, 3)).astype(np.int32)
    h, c = init_predictor_state(cfg, b)
    g_seq, h_seq, c_seq = predictor_sequence(params["predictor"], y, h, c)
    outs = []
    for u in range(3):
        g, h, c = predictor_step(params["predictor"], y[:, u], h, c)
        outs.append(np.asarray(g))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(g_seq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_seq), atol=1e-6)


def test_joint_parity(setup, rng):
    cfg, params, oracle = setup
    b, t, u = 2, 4, 3
    enc = rng.standard_normal((b, t, cfg.d_model)).astype(np.float32)
    pred = rng.standard_normal((b, u, cfg.pred_hidden)).astype(np.float32)
    lo_j = np.asarray(joint_apply(params["joint"], enc, pred))
    lo_t = oracle.joint(enc, pred)
    assert lo_j.shape == (b, t, u, cfg.joint_vocab_size)
    np.testing.assert_allclose(lo_j, lo_t, atol=ATOL, rtol=RTOL)
    # single-step path equals the batched path
    ss = np.asarray(joint_single_step(params["joint"], enc[:, 0], pred[:, 0]))
    np.testing.assert_allclose(ss, lo_j[:, 0, 0], atol=1e-5)
