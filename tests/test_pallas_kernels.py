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


class TestAttBlockKernel:
    """Fused attention-block kernel == the XLA attention section of
    _conformer_layer, on a warm ring cache (interpret mode, f32)."""

    def test_matches_xla_attention(self, rng):
        import jax.numpy as jnp

        from trt_asr_tpu.ops.attention import (
            rel_pos_attention_kv, sinusoidal_pos_table)
        from trt_asr_tpu.ops.common import layer_norm, matmul
        from trt_asr_tpu.ops.pallas.att_block_kernel import (
            att_block_pallas, build_rel_selection)

        d, h, c, tq = 64, 4, 32, 8
        dh = d // h
        sub_len = 6            # rows 6,7 are padding
        cursor, cache_len = 7, 19
        r_pad = s_pad = 128

        def rnd(*s):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)

        x = rnd(tq, d)
        ln_g, ln_b = rnd(d) * 0.2 + 1.0, rnd(d) * 0.1
        wq, wk, wv, wo = rnd(d, d), rnd(d, d), rnd(d, d), rnd(d, d)
        bu, bv = rnd(h, dh), rnd(h, dh)
        kv_cache = rnd(c, 2 * d)
        pos_table = sinusoidal_pos_table(tq, c + tq, d)
        wpos = rnd(d, d)
        pos_proj = matmul(pos_table, wpos)                     # [R, D]
        r_actual = pos_proj.shape[0]

        # ---- XLA reference (exactly encoder._conformer_layer's math) ----
        time_mask = (np.arange(tq) < sub_len)
        age = ((cursor - 1 - np.arange(c)) % c) + 1
        cache_mask = age <= cache_len
        idx_cache = (c + tq - 1) - (age[None, :] + np.arange(tq)[:, None])
        ii, jj = np.arange(tq)[:, None], np.arange(tq)[None, :]
        idx_cur = (c + tq - 1) - (ii - jj)
        rel_idx = jnp.asarray(np.concatenate([idx_cache, idx_cur], 1))[None]
        kv_mask = jnp.asarray(np.concatenate([cache_mask, time_mask]))[None]

        u = layer_norm(x, ln_g, ln_b)
        q = matmul(u, wq).reshape(1, tq, h, dh)
        k_full = jnp.concatenate([kv_cache[None, :, :d], matmul(u, wk)[None]], 1)
        v_full = jnp.concatenate([kv_cache[None, :, d:], matmul(u, wv)[None]], 1)
        y_ref = x + rel_pos_attention_kv(
            q, k_full.reshape(1, c + tq, h, dh), v_full.reshape(1, c + tq, h, dh),
            pos_proj.reshape(-1, h, dh), bu, bv, wo,
            kv_mask=kv_mask, rel_idx=rel_idx)[0]

        # ---- kernel path ----
        posT = jnp.zeros((d, r_pad)).at[:, :r_actual].set(pos_proj.T)
        g_sel, mask = build_rel_selection(
            jnp.int32(cursor), jnp.int32(cache_len), c, tq,
            jnp.int32(sub_len), s_pad, r_pad, dtype=jnp.float32)
        y, u_out, kn, vn = att_block_pallas(
            x, ln_g, ln_b, wq, wk, wv, wo, bu, bv, posT, kv_cache,
            g_sel, mask, n_heads=h, interpret=True)

        np.testing.assert_allclose(np.asarray(u_out), np.asarray(u), atol=1e-5)
        np.testing.assert_allclose(np.asarray(kn), np.asarray(matmul(u, wk)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(vn), np.asarray(matmul(u, wv)),
                                   atol=1e-5)
        got, want = np.asarray(y)[:sub_len], np.asarray(y_ref)[:sub_len]
        np.testing.assert_allclose(got, want, atol=2e-5)


class TestPallasAttEncodeParity:
    """encode(use_pallas_att=True, pad_steps=2) == the XLA path, closed-loop
    over the full chunk schedule (cache growth, saturation, short final
    chunk). Interpret mode, f32."""

    def test_closed_loop_encode(self, rng):
        from trt_asr_tpu.models.parakeet import encode, init_encoder_state
        from trt_asr_tpu.streaming import build_schedule

        cfg = ModelConfig.tiny()
        params = init_params(cfg, seed=3)
        total = 170  # saturates the size-32 cache; ends with a short chunk
        feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
        sched = build_schedule(total, cfg)
        s_ref = init_encoder_state(cfg, 1)
        s_pal = init_encoder_state(cfg, 1)
        for spec in sched:
            x = feats[spec.slice_start : spec.slice_end]
            if x.shape[0] < spec.frames:
                x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
            x, valid = x[None], np.array([spec.valid_frames], np.int32)
            cache_drop = 0 if spec.is_last else cfg.cache_drop_size
            e_ref, l_ref, s_ref = encode(
                params, cfg, x, valid, s_ref,
                drop_extra=spec.drop_extra, cache_drop=cache_drop)
            e_pal, l_pal, s_pal = encode(
                params, cfg, x, valid, s_pal,
                drop_extra=spec.drop_extra, cache_drop=cache_drop,
                pad_steps=2, use_pallas_att=True)
            lr = int(np.asarray(l_ref)[0])
            assert lr == int(np.asarray(l_pal)[0]), f"chunk {spec.idx}"
            np.testing.assert_allclose(
                np.asarray(e_pal)[0, :lr], np.asarray(e_ref)[0, :lr],
                atol=2e-4, rtol=1e-4, err_msg=f"chunk {spec.idx} enc out")
            for a, b, name in [
                (s_pal.att_cache, s_ref.att_cache, "att_cache"),
                (s_pal.kv_cache, s_ref.kv_cache, "kv_cache"),
                (s_pal.time_cache, s_ref.time_cache, "time_cache"),
            ]:
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
                    err_msg=f"chunk {spec.idx} {name}")
            assert np.array_equal(np.asarray(s_pal.cache_len), np.asarray(s_ref.cache_len))
            assert np.array_equal(np.asarray(s_pal.cursor), np.asarray(s_ref.cursor))

    def test_closed_loop_encode_int8(self, rng):
        """Kernel with int8 QuantTensor weights == the XLA q8_matmul path
        (both cast activations to bf16 at the MXU; scores/softmax dtype
        differs, so the bound is bf16-class)."""
        from trt_asr_tpu.models.parakeet import encode, init_encoder_state
        from trt_asr_tpu.models.parakeet.quant import quantize_params
        from trt_asr_tpu.streaming import build_schedule

        cfg = ModelConfig.tiny()
        params = quantize_params(init_params(cfg, seed=3), "encoder")
        total = 113
        feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
        sched = build_schedule(total, cfg)
        s_ref = init_encoder_state(cfg, 1)
        s_pal = init_encoder_state(cfg, 1)
        for spec in sched:
            x = feats[spec.slice_start : spec.slice_end]
            if x.shape[0] < spec.frames:
                x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
            x, valid = x[None], np.array([spec.valid_frames], np.int32)
            cache_drop = 0 if spec.is_last else cfg.cache_drop_size
            e_ref, l_ref, s_ref = encode(
                params, cfg, x, valid, s_ref,
                drop_extra=spec.drop_extra, cache_drop=cache_drop)
            e_pal, l_pal, s_pal = encode(
                params, cfg, x, valid, s_pal,
                drop_extra=spec.drop_extra, cache_drop=cache_drop,
                pad_steps=2, use_pallas_att=True)
            lr = int(np.asarray(l_ref)[0])
            assert lr == int(np.asarray(l_pal)[0])
            np.testing.assert_allclose(
                np.asarray(e_pal)[0, :lr], np.asarray(e_ref)[0, :lr],
                atol=5e-2, rtol=1e-2, err_msg=f"chunk {spec.idx}")


def test_joint_step_kernel_int8(rng):
    """Fused joint kernel with int8 QuantTensor weights == the XLA
    q8_matmul path (both: bf16 activations at the MXU, scale on the f32
    accumulator)."""
    from trt_asr_tpu.models.parakeet.quant import quantize_params
    from trt_asr_tpu.ops.pallas.joint_step_kernel import joint_step_pallas

    cfg = ModelConfig.tiny()
    params = quantize_params(init_params(cfg, seed=6), "joint")
    jp = params["joint"]
    b = 4
    enc_t = rng.standard_normal((b, cfg.d_model)).astype(np.float32)
    g = rng.standard_normal((b, cfg.pred_hidden)).astype(np.float32)

    import jax.numpy as jnp

    e_proj = np.asarray(joint_project_enc(jp, enc_t[:, None, :]))[:, 0]
    want_logits = np.asarray(joint_from_projected(jp, jnp.asarray(e_proj), jnp.asarray(g)))
    want_tok = want_logits[:, : cfg.token_head_size].argmax(1)

    tok, dur, logits = joint_step_pallas(
        jnp.asarray(e_proj), jnp.asarray(g), jp["pred"]["w"],
        jnp.asarray(jp["pred"]["b"]), jp["out"]["w"], jnp.asarray(jp["out"]["b"]),
        ths=cfg.token_head_size, ndur=5, blank_id=cfg.blank_id, interpret=True)
    np.testing.assert_allclose(np.asarray(logits), want_logits,
                               atol=5e-2, rtol=1e-2)
    assert (np.asarray(tok) == want_tok).all()


class TestConvBlockKernel:
    def test_matches_xla_conv_module(self, rng):
        """Fused conv-module kernel == the XLA conv section of
        _conformer_layer (interpret mode, f32)."""
        import jax.numpy as jnp

        from trt_asr_tpu.ops.common import (batch_norm_inference, glu,
                                            layer_norm, matmul, silu)
        from trt_asr_tpu.ops.conv import depthwise_conv1d
        from trt_asr_tpu.ops.pallas.conv_block_kernel import conv_block_pallas

        d, kk, tq, valid = 64, 9, 8, 6
        half = (kk - 1) // 2

        def rnd(*s):
            return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.3)

        x = rnd(tq, d)
        ln_g, ln_b = rnd(d) * 0.2 + 1.0, rnd(d) * 0.1
        pw1, pw2, dw = rnd(d, 2 * d), rnd(d, d), rnd(kk, d)
        bn_g = rnd(d) * 0.1 + 1.0
        bn_b, bn_m = rnd(d) * 0.1, rnd(d) * 0.1
        bn_v = jnp.abs(rnd(d)) * 0.5 + 0.8
        tc = rnd(half, d)
        tmask = (np.arange(tq) < valid)

        c_ref = glu(matmul(layer_norm(x, ln_g, ln_b), pw1), axis=-1)
        c_ref = jnp.where(jnp.asarray(tmask)[:, None], c_ref, 0)
        ext = jnp.concatenate([tc, c_ref, jnp.zeros((half, d))], axis=0)
        cv = depthwise_conv1d(ext[None], dw)[0]
        cv = batch_norm_inference(cv, bn_g, bn_b, bn_m, bn_v)
        y_ref = x + matmul(silu(cv), pw2)

        y, c = conv_block_pallas(
            x, ln_g, ln_b, pw1, dw, bn_g, bn_b, bn_m, bn_v, pw2, tc,
            jnp.asarray(tmask.astype(np.float32))[:, None], interpret=True)
        np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)

    def test_closed_loop_all_kernels_int8(self, rng):
        """encode() with ALL fused kernels (attention + conv + FFN) on int8
        weights == the XLA q8 path, closed loop (bf16-class tolerance: both
        paths run bf16 MXU math with different fusion orders)."""
        from trt_asr_tpu.models.parakeet import encode, init_encoder_state
        from trt_asr_tpu.models.parakeet.quant import quantize_params
        from trt_asr_tpu.streaming import build_schedule

        cfg = ModelConfig.tiny()
        params = quantize_params(init_params(cfg, seed=3), "encoder")
        total = 113
        feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
        sched = build_schedule(total, cfg)
        s_ref = init_encoder_state(cfg, 1)
        s_pal = init_encoder_state(cfg, 1)
        for spec in sched:
            x = feats[spec.slice_start : spec.slice_end]
            if x.shape[0] < spec.frames:
                x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
            x, valid = x[None], np.array([spec.valid_frames], np.int32)
            cache_drop = 0 if spec.is_last else cfg.cache_drop_size
            e_ref, l_ref, s_ref = encode(
                params, cfg, x, valid, s_ref,
                drop_extra=spec.drop_extra, cache_drop=cache_drop)
            e_pal, l_pal, s_pal = encode(
                params, cfg, x, valid, s_pal,
                drop_extra=spec.drop_extra, cache_drop=cache_drop,
                pad_steps=2, use_pallas_att=True, use_pallas_conv=True,
                use_pallas_ffn=True)
            lr = int(np.asarray(l_ref)[0])
            assert lr == int(np.asarray(l_pal)[0])
            np.testing.assert_allclose(
                np.asarray(e_pal)[0, :lr], np.asarray(e_ref)[0, :lr],
                atol=5e-2, rtol=1e-2, err_msg=f"chunk {spec.idx}")


class TestFlashAttention:
    """Blocked (flash) offline attention kernel == the XLA softmax path
    (interpret mode, f32). Reference role: the TRT engine's fused offline
    rel_pos attention (tools/build_trt profiles, encoder component)."""

    def test_kernel_matches_softmax_math(self, rng):
        import jax.numpy as jnp

        from trt_asr_tpu.ops.pallas.flash_att_kernel import flash_bias_attention

        b, t, h, dh = 2, 37, 2, 64          # t deliberately not block-aligned
        q = rng.standard_normal((b, t, h, dh)).astype(np.float32)
        k = rng.standard_normal((b, t, h, dh)).astype(np.float32)
        v = rng.standard_normal((b, t, h, dh)).astype(np.float32)
        bd = rng.standard_normal((b, h, t, t)).astype(np.float32)
        lens = np.array([t, 29])
        mask = np.arange(t)[None, :] < lens[:, None]

        s = (np.einsum("bthd,bshd->bhts", q, k) + bd) / np.sqrt(dh)
        s = np.where(mask[:, None, None, :], s, -1e30)
        a = np.exp(s - s.max(-1, keepdims=True))
        a = a / a.sum(-1, keepdims=True)
        want = np.einsum("bhts,bshd->bthd", a, v).reshape(b, t, h * dh)

        got = np.asarray(flash_bias_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(bd),
            jnp.asarray(mask), interpret=True))
        for i in range(b):
            np.testing.assert_allclose(got[i, : lens[i]], want[i, : lens[i]],
                                       atol=2e-5, rtol=1e-4)

    def test_offline_encode_flash_matches_xla(self, rng):
        """Whole offline encoder with use_flash_att == the XLA path, incl.
        a short (masked) row in the batch."""
        from trt_asr_tpu.models.parakeet import offline_encode

        cfg = ModelConfig.tiny()
        params = init_params(cfg, seed=2)
        b, frames = 2, 168
        feats = (0.5 * rng.standard_normal((b, frames, cfg.feat_in))
                 ).astype(np.float32)
        lengths = np.array([frames, 111], np.int32)
        want, wl = offline_encode(params, cfg, feats, lengths)
        got, gl = offline_encode(params, cfg, feats, lengths,
                                 use_flash_att=True)
        np.testing.assert_array_equal(np.asarray(wl), np.asarray(gl))
        for i in range(b):
            n = int(np.asarray(wl)[i])
            assert n > 0
            np.testing.assert_allclose(np.asarray(got)[i, :n],
                                       np.asarray(want)[i, :n],
                                       atol=5e-5, rtol=1e-4)


def test_flash_fallback_warns_and_counts(rng):
    """use_flash with unmet static gating (tq != tkv) must warn at trace
    time and leave flash_trace_counts 'taken' unchanged — a perf row
    labelled 'flash' can then be detected as an XLA-path measurement."""
    import warnings as _warnings

    import jax.numpy as jnp

    from trt_asr_tpu.ops import attention as att

    b, tq, tkv, h, dh = 1, 4, 6, 2, 8
    q = jnp.asarray(rng.standard_normal((b, tq, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tkv, h, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tkv, h, dh)), jnp.float32)
    pp = jnp.asarray(rng.standard_normal((tq + tkv - 1, h, dh)), jnp.float32)
    bu = jnp.zeros((h, dh), jnp.float32)
    wo = jnp.eye(h * dh, dtype=jnp.float32)

    before = dict(att.flash_trace_counts)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        out = att.rel_pos_attention_kv(q, k, v, pp, bu, bu, wo,
                                       use_flash=True)
    assert out.shape == (b, tq, h * dh)
    assert att.flash_trace_counts["requested"] == before["requested"] + 1
    assert att.flash_trace_counts["taken"] == before["taken"]
    assert any("use_flash requested but unavailable" in str(w.message)
               for w in rec)


class TestRelShiftKernel:
    """Fused rel-pos bias+shift kernel (ops/pallas/rel_shift_kernel.py):
    bit-identical to the XLA einsum+skew it replaces — the skew alone cost
    ~120 ms/forward at 30 s B=32 (artifacts/perf/offline_att_ablation_sub
    .json); the kernel folds it into the pd matmul's VMEM epilogue."""

    def _xla_bd(self, q_v, pos):
        import jax.numpy as jnp

        b, tq, h, dh = q_v.shape
        pd = jnp.einsum("bthd,rhd->bhtr", q_v, pos,
                        preferred_element_type=jnp.float32).astype(q_v.dtype)
        r = pd.shape[-1]
        padded = jnp.pad(pd, ((0, 0), (0, 0), (0, 0), (1, 0)))
        return padded.reshape(b, h, tq * (r + 1))[..., tq:] \
            .reshape(b, h, tq, r)[..., : tq]

    @pytest.mark.parametrize("shape", [(2, 375, 8, 128), (1, 384, 4, 64),
                                       (3, 130, 2, 128), (1, 57, 2, 32)])
    def test_matches_xla_skew_bitwise(self, shape, rng):
        import jax.numpy as jnp

        from trt_asr_tpu.ops.pallas.rel_shift_kernel import \
            rel_pos_bias_shifted

        b, tq, h, dh = shape
        q_v = jnp.asarray(rng.standard_normal((b, tq, h, dh))
                          .astype(np.float32)).astype(jnp.bfloat16)
        pos = jnp.asarray(rng.standard_normal((2 * tq - 1, h, dh))
                          .astype(np.float32)).astype(jnp.bfloat16)
        want = np.asarray(self._xla_bd(q_v, pos), np.float32)
        got = np.asarray(rel_pos_bias_shifted(q_v, pos, tkv=tq,
                                              interpret=True), np.float32)
        np.testing.assert_array_equal(got, want)

    def test_attention_with_shift_kernel_matches(self, rng):
        """rel_pos_attention_kv(use_shift_kernel=True) == the XLA path on
        the full offline attention core."""
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu

        from trt_asr_tpu.ops.attention import rel_pos_attention_kv

        b, t, h, dh = 2, 130, 2, 64
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32)).astype(jnp.bfloat16)
        q, k, v = mk(b, t, h, dh), mk(b, t, h, dh), mk(b, t, h, dh)
        pos = mk(2 * t - 1, h, dh)
        bu, bv = mk(h, dh), mk(h, dh)
        wo = mk(h * dh, h * dh)
        mask = jnp.asarray(np.arange(t)[None, :] < np.array([t, 101])[:, None])
        want = np.asarray(rel_pos_attention_kv(
            q, k, v, pos, bu, bv, wo, kv_mask=mask,
            use_shift_kernel=False), np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(rel_pos_attention_kv(
                q, k, v, pos, bu, bv, wo, kv_mask=mask,
                use_shift_kernel=True), np.float32)
        np.testing.assert_allclose(got[0, :t], want[0, :t], atol=2e-2,
                                   rtol=1e-2)
        np.testing.assert_array_equal(got, want)
