"""Pallas kernel parity vs the XLA reference paths (interpret mode on CPU;
the same checks run compiled on TPU via TRT_ASR_TEST_PLATFORM=tpu)."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import init_params
from trt_asr_tpu.models.parakeet.joint import joint_from_projected, joint_project_enc


def test_joint_step_kernel_matches_xla(rng):
    from trt_asr_tpu.ops.pallas.joint_step_kernel import joint_step_pallas

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=6)["joint"]
    b = 4
    enc_t = rng.standard_normal((b, cfg.d_model)).astype(np.float32)
    g = rng.standard_normal((b, cfg.pred_hidden)).astype(np.float32)

    import jax.numpy as jnp

    e_proj = np.asarray(joint_project_enc(params, enc_t[:, None, :]))[:, 0]
    want_logits = np.asarray(joint_from_projected(params, jnp.asarray(e_proj), jnp.asarray(g)))
    want_tok = want_logits[:, : cfg.token_head_size].argmax(1)
    want_dur = want_logits[:, cfg.token_head_size : cfg.token_head_size + 5].argmax(1)

    tok, dur, logits = joint_step_pallas(
        e_proj, g, np.asarray(params["pred"]["w"]), np.asarray(params["pred"]["b"]),
        np.asarray(params["out"]["w"]), np.asarray(params["out"]["b"]),
        ths=cfg.token_head_size, ndur=5, blank_id=cfg.blank_id, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), want_logits, atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(tok), want_tok)
    np.testing.assert_array_equal(np.asarray(dur), want_dur)


def test_decode_with_pallas_joint_matches_xla(rng):
    """Whole decode loop with the fused kernel == XLA path, token-exact."""
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state, tdt_greedy_decode_chunk
    from trt_asr_tpu.models.parakeet import offline_encode

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=3)
    feats = (0.6 * rng.standard_normal((1, 120, cfg.feat_in))).astype(np.float32)
    enc, enc_len = offline_encode(params, cfg, feats, np.array([120], np.int32))
    t = int(np.asarray(enc_len)[0])
    import jax.numpy as jnp

    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    toks_x, n_x, _ = tdt_greedy_decode_chunk(
        params, cfg, enc[0], jnp.int32(t), ds, max_tokens=8 * t)
    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    toks_p, n_p, _ = tdt_greedy_decode_chunk(
        params, cfg, enc[0], jnp.int32(t), ds, max_tokens=8 * t,
        use_pallas_joint=True, pallas_interpret=True)
    want = [int(x) for x in np.asarray(toks_x)[: int(n_x)]]
    got = [int(x) for x in np.asarray(toks_p)[: int(n_p)]]
    assert got == want and len(got) > 0


def test_fused_ffn_kernel_matches_xla(rng):
    import jax.numpy as jnp

    from trt_asr_tpu.ops.common import layer_norm, matmul, silu
    from trt_asr_tpu.ops.pallas.ffn_kernel import fused_ffn_pallas

    t, d, e = 6, 64, 256
    x = rng.standard_normal((2, t, d)).astype(np.float32)
    g = (0.1 * rng.standard_normal(d) + 1).astype(np.float32)
    b = (0.1 * rng.standard_normal(d)).astype(np.float32)
    w1 = (rng.standard_normal((d, e)) / np.sqrt(d)).astype(np.float32)
    w2 = (rng.standard_normal((e, d)) / np.sqrt(e)).astype(np.float32)
    want = x + 0.5 * np.asarray(matmul(silu(matmul(layer_norm(jnp.asarray(x), g, b), w1)), w2))
    got = np.asarray(fused_ffn_pallas(jnp.asarray(x), g, b, w1, w2, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_encoder_with_pallas_ffn_matches(rng):
    """Full encoder with fused-FFN layers == XLA encoder (streaming chunk)."""
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=2)
    feats = (0.5 * rng.standard_normal((1, 57, cfg.feat_in))).astype(np.float32)
    lens = np.array([57], np.int32)
    e1, l1, s1 = encode(params, cfg, feats, lens, init_encoder_state(cfg, 1),
                        drop_extra=2, cache_drop=3)
    e2, l2, s2 = encode(params, cfg, feats, lens, init_encoder_state(cfg, 1),
                        drop_extra=2, cache_drop=3, use_pallas_ffn=True)
    np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2.att_cache), np.asarray(s1.att_cache),
                               atol=2e-5)


def test_joint_step_kernel_blank_penalty(rng):
    from trt_asr_tpu.ops.pallas.joint_step_kernel import joint_step_pallas

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=6)["joint"]
    e_proj = rng.standard_normal((1, cfg.joint_hidden)).astype(np.float32)
    g = rng.standard_normal((1, cfg.pred_hidden)).astype(np.float32)
    # huge penalty -> blank can never win
    tok, _, _ = joint_step_pallas(
        e_proj, g, np.asarray(params["pred"]["w"]), np.asarray(params["pred"]["b"]),
        np.asarray(params["out"]["w"]), np.asarray(params["out"]["b"]),
        ths=cfg.token_head_size, ndur=5, blank_id=cfg.blank_id,
        blank_penalty=1e6, interpret=True)
    assert int(np.asarray(tok)[0]) != cfg.blank_id
