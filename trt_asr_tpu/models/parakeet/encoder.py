"""Fast Conformer encoder — offline and cache-aware streaming, one code path.

Reimplements (TPU-first, not a translation) the behavior the reference gets
from its TRT-compiled NeMo encoder exports (encoder.onnx /
encoder_streaming.onnx; contract encoder.*, streaming.*):

- dw_striding 8x subsampling pre-encode
- N conformer layers: 0.5*FF -> rel-pos MHA -> conv(k, BN, SiLU) -> 0.5*FF
  -> LayerNorm, bias-free linears (use_bias=false)
- streaming caches: per-layer attention KV history (<= cache_size steps) and
  depthwise-conv left context (K = (kernel-1)//2 frames), with explicit
  cache_last_channel_len tracking (contract streaming_io)

Key TPU design choices:
- ONE ``lax.scan`` over stacked layer params (single traced layer body).
- Attention cache held RIGHT-ALIGNED so relative-position indexing and the
  cache update (`concat[..., -C:]`) are static-shape; the dynamic fill level
  only enters via the boolean kv mask (see ops/attention.py). Conversion to
  the contract's left-aligned prefix layout happens only at the state
  export/import boundary (state_to_contract / state_from_contract).
- Short final chunks are handled by zero-padding + length masking instead of
  a new program shape: the streaming step compiles exactly once per chunk
  schedule regime (41 / 57 frames), the TPU analog of the reference's TRT
  shape profiles (contract trt.profiles.encoder_streaming).

Streaming step semantics (chunk schedule per contract streaming.*):
chunk c covers feature frames [start - pre_encode, start + chunk); after
pre-encode, `drop_extra_pre_encoded` leading steps are dropped when the
chunk includes pre-encode context; of the remaining Tq steps the first
(Tq - cache_drop_size) feed the caches and the first valid_out_len are
emitted; the trailing cache_drop_size steps are lookahead, recomputed by the
next chunk. (Reference behavior: NeMo cache_aware_stream_step +
streaming_post_process as driven by tools/verify_nemo/streaming_encoder_cache.py.)
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.ops.attention import rel_pos_attention_kv, sinusoidal_pos_table
from trt_asr_tpu.ops.common import batch_norm_inference, einsum, glu, layer_norm, matmul, silu
from trt_asr_tpu.ops.conv import depthwise_conv1d, dw_striding_subsample, subsampled_length


class EncoderState(NamedTuple):
    """Streaming caches, stored as RING BUFFERS along the cache axis.

    ``att_cache`` holds the contract's raw attention INPUTS (needed for
    state export in the reference layout); ``kv_cache`` holds the PROJECTED
    keys++values ([..., :D] = k, [..., D:] = v) so the hot path projects
    only the Tq new positions per chunk (exact, since use_bias=false makes
    k/v projections linear). kv_cache is derived state, reconstructable
    from att_cache + params (state_from_contract).

    Ring layout: ``cursor[b]`` is the next write slot; slot j holds the
    entry of age ((cursor-1-j) mod C) + 1 encoder steps, valid while age <=
    cache_len. Each chunk SCATTERS only its new entries instead of
    rewriting the whole cache (at B=32 full size, the rewrite alone cost
    ~2.4 GB of HBM traffic per chunk — the ring cuts cache update cost by
    ~2 orders of magnitude and is the true functional analog of the
    reference's zero-copy ping-pong swap, parakeet_trt.cpp:2741-2751).
    Attention consumes the cache in ring order with per-slot relative
    distances (see ops/attention.py rel_idx)."""

    att_cache: jnp.ndarray   # [L, B, C, D]
    time_cache: jnp.ndarray  # [L, B, K, D]
    kv_cache: jnp.ndarray    # [L, B, C, 2D]
    cache_len: jnp.ndarray   # [B] int32 — number of valid entries
    cursor: jnp.ndarray      # [B] int32 — next ring write slot


def init_encoder_state(cfg: ModelConfig, batch: int, dtype=jnp.float32) -> EncoderState:
    return EncoderState(
        att_cache=jnp.zeros((cfg.num_layers, batch, cfg.att_cache_size, cfg.d_model), dtype),
        time_cache=jnp.zeros((cfg.num_layers, batch, cfg.conv_context_size, cfg.d_model), dtype),
        kv_cache=jnp.zeros((cfg.num_layers, batch, cfg.att_cache_size, 2 * cfg.d_model), dtype),
        cache_len=jnp.zeros((batch,), jnp.int32),
        cursor=jnp.zeros((batch,), jnp.int32),
    )


def reset_encoder_state_rows(state: EncoderState, row_mask: jnp.ndarray) -> EncoderState:
    """Zero the state of streams where row_mask[b] is True (stream add/remove
    in a batched server — reference analog: parakeet_reset_utterance)."""
    m_b = row_mask.reshape(1, -1, 1, 1)
    return EncoderState(
        att_cache=jnp.where(m_b, 0.0, state.att_cache).astype(state.att_cache.dtype),
        time_cache=jnp.where(m_b, 0.0, state.time_cache).astype(state.time_cache.dtype),
        kv_cache=jnp.where(m_b, 0.0, state.kv_cache).astype(state.kv_cache.dtype),
        cache_len=jnp.where(row_mask, 0, state.cache_len),
        cursor=jnp.where(row_mask, 0, state.cursor),
    )


def _ring_write(cache: jnp.ndarray, block: jnp.ndarray, cursor: jnp.ndarray,
                appended: jnp.ndarray) -> jnp.ndarray:
    """Scatter block[b, :appended[b]] into ring slots (cursor[b] + i) mod C.

    cache [B, C, D], block [B, S, D]. Touches only the written slots; with
    donated state buffers this is an in-place update."""
    b, c, _ = cache.shape
    s = block.shape[1]
    pos = (cursor[:, None] + jnp.arange(s)[None, :]) % c               # [B, S]
    pos = jnp.where(jnp.arange(s)[None, :] < appended[:, None], pos, c)  # -> drop
    bidx = jnp.arange(b)[:, None]
    return cache.at[bidx, pos].set(block.astype(cache.dtype), mode="drop")


def _layer_params_slice(layers: Dict[str, jnp.ndarray]):
    """Pack stacked layer params for lax.scan consumption (already [L, ...])."""
    return layers


def _append_cache(cache: jnp.ndarray, block: jnp.ndarray, appended: jnp.ndarray) -> jnp.ndarray:
    """Right-aligned cache update with per-row dynamic valid count.

    cache [B, C, D], block [B, S, D] whose first appended[b] entries are
    valid -> last C entries of (cache ++ block[:appended]) per row, as a
    static-shape gather: slice of size C starting at appended[b].
    """
    c = cache.shape[1]
    full = jnp.concatenate([cache, block.astype(cache.dtype)], axis=1)
    idx = appended[:, None] + jnp.arange(c)[None, :]
    return jnp.take_along_axis(full, idx[:, :, None], axis=1)


def _conformer_layer(
    lp: Dict[str, jnp.ndarray],
    x: jnp.ndarray,                 # [B, Tq, D]
    att_cache: jnp.ndarray,         # [B, C, D] ring-ordered raw inputs
    time_cache: jnp.ndarray,        # [B, K, D]
    kv_cache: jnp.ndarray,          # [B, C, 2D] ring-ordered projected k++v
    pos_proj: jnp.ndarray,          # [Tq + C + Tq - 1, D] (pos_table @ W_pos)
    kv_mask: jnp.ndarray,           # [B, C + Tq] bool
    rel_idx: jnp.ndarray,           # [B, Tq, C + Tq] pos-table indices
    time_mask: jnp.ndarray,         # [B, Tq] bool (valid current steps)
    cursor: jnp.ndarray,            # [B] ring write position
    n_heads: int,
    cache_keep: int,                # Tq - cache_drop (static)
    appended: jnp.ndarray,          # [B] = min(sub_len, cache_keep), dynamic
    use_pallas_ffn: bool = False,
    use_pallas_conv: bool = False,       # fused conv-module kernel (B=1)
    pallas_att: Optional[Tuple] = None,  # (g_sel, kv_mask_1S, posT [D, R_pad])
                                         # -> fused attention-block kernel (B=1)
    use_flash_att: bool = False,         # offline: blocked flash kernel
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, tq, d = x.shape
    k = time_cache.shape[1]
    dh = d // n_heads
    c_size = att_cache.shape[1] if att_cache is not None else 0

    def ffn(xx, ln_g, ln_b, w1, w2):
        if use_pallas_ffn:
            from trt_asr_tpu.ops.pallas.ffn_kernel import fused_ffn_pallas

            return fused_ffn_pallas(xx, ln_g, ln_b, w1, w2, scale=0.5)
        hh = layer_norm(xx, ln_g, ln_b)
        return xx + 0.5 * matmul(silu(matmul(hh, w1)), w2)

    # --- macaron FFN (1/2 residual) ---
    x = ffn(x, lp["ff1_ln_g"], lp["ff1_ln_b"], lp["ff1_w1"], lp["ff1_w2"])

    # --- rel-pos self-attention: project ONLY the Tq new positions; the
    # cached history contributes pre-projected k/v in ring order ---
    if pallas_att is not None:
        from trt_asr_tpu.ops.pallas.att_block_kernel import att_block_pallas

        g_sel, p_mask, posT = pallas_att
        y1, u1, kn1, vn1 = att_block_pallas(
            x[0], lp["att_ln_g"], lp["att_ln_b"], lp["att_wq"], lp["att_wk"],
            lp["att_wv"], lp["att_wo"], lp["att_bias_u"], lp["att_bias_v"],
            posT, kv_cache[0], g_sel, p_mask, n_heads=n_heads)
        u = u1[None].astype(x.dtype)
        k_new, v_new = kn1[None].astype(x.dtype), vn1[None].astype(x.dtype)
        x = y1[None].astype(x.dtype)
    else:
        u = layer_norm(x, lp["att_ln_g"], lp["att_ln_b"])
        q = matmul(u, lp["att_wq"]).reshape(b, tq, n_heads, dh)
        k_new = matmul(u, lp["att_wk"])                       # [B, Tq, D]
        v_new = matmul(u, lp["att_wv"])
        if c_size:
            k_full = jnp.concatenate([kv_cache[..., :d].astype(u.dtype), k_new], axis=1)
            v_full = jnp.concatenate([kv_cache[..., d:].astype(u.dtype), v_new], axis=1)
        else:  # offline: no cache, no concat (zero-size arrays hurt some backends)
            k_full, v_full = k_new, v_new
        y = rel_pos_attention_kv(
            q, k_full.reshape(b, c_size + tq, n_heads, dh),
            v_full.reshape(b, c_size + tq, n_heads, dh),
            pos_proj.reshape(-1, n_heads, dh),
            lp["att_bias_u"], lp["att_bias_v"], lp["att_wo"],
            kv_mask=kv_mask, rel_idx=rel_idx, use_flash=use_flash_att)
        x = x + y
    if c_size:
        new_att_cache = _ring_write(att_cache, u[:, :cache_keep], cursor, appended)
        kv_new = jnp.concatenate([k_new, v_new], axis=-1)[:, :cache_keep]
        new_kv_cache = _ring_write(kv_cache, kv_new, cursor, appended)
    else:
        new_att_cache, new_kv_cache = att_cache, kv_cache

    # --- convolution module ---
    from trt_asr_tpu.ops.quant import QuantTensor

    # with int8 weights, conv + FFN2 + out-LN fuse into ONE kernel
    # (11.5 MB of weights — only the int8 representation fits VMEM)
    fused_tail = (use_pallas_conv and use_pallas_ffn
                  and isinstance(lp["conv_pw1"], QuantTensor)
                  and isinstance(lp["ff2_w1"], QuantTensor))
    if fused_tail:
        from trt_asr_tpu.ops.pallas.conv_block_kernel import conv_ffn_ln_pallas

        y2, c1 = conv_ffn_ln_pallas(
            x[0].astype(jnp.float32), lp["conv_ln_g"], lp["conv_ln_b"],
            lp["conv_pw1"], lp["conv_dw"], lp["conv_bn_g"], lp["conv_bn_b"],
            lp["conv_bn_m"], lp["conv_bn_v"], lp["conv_pw2"],
            time_cache[0], time_mask[0][:, None].astype(jnp.float32),
            lp["ff2_ln_g"], lp["ff2_ln_b"], lp["ff2_w1"], lp["ff2_w2"],
            lp["out_ln_g"], lp["out_ln_b"])
        c = c1[None].astype(x.dtype)
        new_time_cache = _append_cache(time_cache, c[:, :cache_keep], appended)
        return (y2[None].astype(x.dtype), new_att_cache, new_time_cache,
                new_kv_cache)
    if use_pallas_conv:
        from trt_asr_tpu.ops.pallas.conv_block_kernel import conv_block_pallas

        y2, c1 = conv_block_pallas(
            x[0].astype(jnp.float32), lp["conv_ln_g"], lp["conv_ln_b"],
            lp["conv_pw1"], lp["conv_dw"], lp["conv_bn_g"], lp["conv_bn_b"],
            lp["conv_bn_m"], lp["conv_bn_v"], lp["conv_pw2"],
            time_cache[0], time_mask[0][:, None].astype(jnp.float32))
        c = c1[None].astype(x.dtype)
        x = y2[None].astype(x.dtype)
    else:
        c = layer_norm(x, lp["conv_ln_g"], lp["conv_ln_b"])
        c = glu(matmul(c, lp["conv_pw1"]), axis=-1)
        c = jnp.where(time_mask[:, :, None], c, 0)  # zero padded steps pre-conv
        c_ext = jnp.concatenate(
            [time_cache.astype(c.dtype), c, jnp.zeros((b, k, d), c.dtype)], axis=1)
        cv = depthwise_conv1d(c_ext, lp["conv_dw"])           # [B, Tq, D]
        cv = batch_norm_inference(cv, lp["conv_bn_g"], lp["conv_bn_b"],
                                  lp["conv_bn_m"], lp["conv_bn_v"])
        cv = matmul(silu(cv), lp["conv_pw2"])
        x = x + cv
    new_time_cache = _append_cache(time_cache, c[:, :cache_keep], appended)

    # --- FFN 2 (1/2 residual) ---
    x = ffn(x, lp["ff2_ln_g"], lp["ff2_ln_b"], lp["ff2_w1"], lp["ff2_w2"])

    x = layer_norm(x, lp["out_ln_g"], lp["out_ln_b"])
    return x, new_att_cache, new_time_cache, new_kv_cache


def encode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    feats: jnp.ndarray,            # [B, T, feat_in]
    lengths: jnp.ndarray,          # [B] int32 (valid feature frames)
    state: Optional[EncoderState] = None,
    *,
    drop_extra: int = 0,           # static: pre-encoded steps to drop (0 | drop_extra_pre_encoded)
    cache_drop: int = 0,           # static: trailing lookahead steps kept out of caches
    valid_cap: Optional[int] = None,  # static: emission cap (streaming.valid_out_len);
                                      # None = emit up to Tq - cache_drop (legacy coupling)
    cache_drop_vec: Optional[jnp.ndarray] = None,  # [B] traced per-row cache_drop —
                                      # lets a lockstep batch mix steady chunks
                                      # (drop 3) and final flush chunks (drop 0)
                                      # in ONE program (overrides `cache_drop`)
    valid_cap_vec: Optional[jnp.ndarray] = None,   # [B] traced per-row emission cap
    pad_steps: int = 0,            # static: zero rows appended after drop_extra to
                                   # reach an MXU-aligned step count (the pad rows
                                   # are masked everywhere; cache/emission math
                                   # uses the REAL step count)
    use_pallas_att: bool = False,  # fused attention-block kernel (B=1 streaming)
    pos_projT: Optional[jnp.ndarray] = None,  # [L, D, R_pad] for the kernel path
    compute_dtype=jnp.float32,
    pos_proj: Optional[jnp.ndarray] = None,  # precomputed [L, R, D] (see precompute_pos_proj)
    use_pallas_ffn: bool = False,
    use_pallas_conv: bool = False,   # fused conv-module kernel (B=1)
    use_flash_att: bool = False,     # offline: blocked (flash) attention —
                                     # no [B,H,T,T] HBM score tensors
    remat: bool = False,             # rematerialize layer activations on the
                                     # backward pass (jax.checkpoint around
                                     # the scanned layer body): activation
                                     # HBM drops from O(L) layers to O(1) at
                                     # the cost of one extra forward — the
                                     # long-utterance / big-batch training
                                     # memory lever (no effect on inference)
    mask_pad_subsample: bool = False,  # zero padded tails between subsample
                                     # stages so a padded batch row equals
                                     # the exact-length run (ops/conv.py);
                                     # off by default: the streaming golden
                                     # semantics (torch oracle, NeMo) run
                                     # the raw stack over the padded window
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[EncoderState]]:
    """Returns (enc_out [B, Tq, D] in compute dtype, out_lengths [B], new_state).

    enc_out always has the full static Tq step axis; out_lengths gives the
    valid count (= min(sub_len - drop_extra, valid_cap or Tq - cache_drop)).
    Callers mask or slice. state=None selects pure offline behavior.

    Emission vs caching are independent (NeMo semantics): the first
    valid_cap post-drop steps are emitted while only the first
    (Tq - cache_drop) enter the caches. They coincide for steady cache3
    chunks (both 3) but differ for a nemo_compat chunk 0 (emit 3, cache 1).
    """
    enc_p = params["encoder"]
    b = feats.shape[0]
    x = dw_striding_subsample(enc_p["pre_encode"], feats.astype(compute_dtype),
                              lengths=lengths if mask_pad_subsample else None)
    sub_len = subsampled_length(lengths, cfg.stride_stages)
    if drop_extra:
        x = x[:, drop_extra:]
        sub_len = jnp.maximum(sub_len - drop_extra, 0)
    if pad_steps:
        x = jnp.pad(x, ((0, 0), (0, pad_steps), (0, 0)))
    tq = x.shape[1]
    tq_real = tq - pad_steps
    d = cfg.d_model

    streaming = state is not None
    if streaming:
        c_size = state.att_cache.shape[2]
        cache_len = state.cache_len
        cursor = state.cursor
        att_cache0, time_cache0, kv_cache0 = (state.att_cache, state.time_cache,
                                              state.kv_cache)
    else:
        c_size = 0
        cache_len = jnp.zeros((b,), jnp.int32)
        cursor = jnp.zeros((b,), jnp.int32)
        att_cache0 = kv_cache0 = None  # offline: no zero-size arrays in the scan
        time_cache0 = jnp.zeros((cfg.num_layers, b, cfg.conv_context_size, d), compute_dtype)

    if cache_drop_vec is not None:
        # per-row dynamic keep: slice the whole block statically, bound the
        # per-row write count by `appended` (the ring scatter masks by it)
        cache_keep = tq_real
        keep_vec = jnp.maximum(tq_real - cache_drop_vec.astype(jnp.int32), 0)
        appended = jnp.minimum(sub_len, keep_vec).astype(jnp.int32)
    else:
        keep_vec = None
        cache_keep = max(tq_real - cache_drop, 0)
        appended = jnp.minimum(sub_len, cache_keep).astype(jnp.int32)

    if pos_proj is None:
        if use_pallas_att and pos_projT is not None:
            # kernel path with a precomputed transposed table: the untransposed
            # pos_proj is dead (scan input DCE'd) — a dummy avoids the einsum
            pos_proj = jnp.zeros((cfg.num_layers, 1, d), compute_dtype)
        else:
            # one einsum for all layers (input-independent; sessions may pass a
            # precomputed table — see precompute_pos_proj)
            pos_table = sinusoidal_pos_table(tq, c_size + tq, d, dtype=compute_dtype)
            pos_proj = einsum("rd,lde->lre", pos_table,
                              enc_p["layers"]["att_wpos"].astype(compute_dtype))

    time_mask = jnp.arange(tq)[None, :] < sub_len[:, None]               # [B, Tq]
    # ring-slot ages and relative-position indices (shared by all layers):
    # slot j holds the entry age ((cursor-1-j) mod C) + 1; valid while
    # age <= cache_len. pos-table index for distance dist is
    # (C+Tq-1) - dist (table descending); cache dist = age + i, current
    # dist = i - j'.
    if c_size:
        age = ((cursor[:, None] - 1 - jnp.arange(c_size)[None, :]) % c_size) + 1
        cache_mask = age <= cache_len[:, None]
        idx_cache = (c_size + tq - 1) - (age[:, None, :]
                                         + jnp.arange(tq)[None, :, None])   # [B,Tq,C]
        ii = jnp.arange(tq)[None, :, None]
        jj = jnp.arange(tq)[None, None, :]
        idx_cur = jnp.broadcast_to((c_size + tq - 1) - (ii - jj), (b, tq, tq))
        rel_idx = jnp.concatenate([idx_cache.astype(jnp.int32), idx_cur], axis=2)
        kv_mask = jnp.concatenate([cache_mask, time_mask], axis=1)
    else:
        # offline: indices are static — rel_idx=None selects the attention
        # core's static index matrix (a dynamic-index gather at large T
        # compiles pathologically on some backends)
        rel_idx = None
        kv_mask = time_mask

    x = jnp.where(time_mask[:, :, None], x, 0)

    if use_pallas_conv:
        assert b == 1, "use_pallas_conv requires B=1"
    pallas_shared = None
    if use_pallas_att:
        # fused attention-block kernel: B=1 streaming only. The positional
        # selection tensor + mask are built ONCE per chunk and shared by all
        # layers; per-layer pos projections enter the scan transposed/padded.
        assert streaming and b == 1, "use_pallas_att requires B=1 streaming"
        from trt_asr_tpu.ops.pallas.att_block_kernel import (
            _round_up, build_rel_selection)
        from trt_asr_tpu.ops.quant import QuantTensor

        s_pad = _round_up(c_size + tq, 128)
        if pos_projT is None:
            r_actual = pos_proj.shape[1]
            r_pad = _round_up(r_actual, 128)
            pos_projT = jnp.zeros((cfg.num_layers, d, r_pad), compute_dtype)
            pos_projT = pos_projT.at[:, :, :r_actual].set(
                jnp.swapaxes(pos_proj, 1, 2).astype(compute_dtype))
        else:
            r_pad = pos_projT.shape[2]
        # g_sel is {0,1} — exact in any dtype; use the kernel's MXU dtype so
        # the in-kernel selection matmul runs at bf16 rate and VMEM stays
        # within budget at full size (bf16 [8,384,384] = 2.4 MB vs 4.7 f32)
        wq_leaf = enc_p["layers"]["att_wq"]
        g_dtype = (jnp.bfloat16 if isinstance(wq_leaf, QuantTensor)
                   else wq_leaf.dtype)
        g_sel, p_mask = build_rel_selection(
            cursor[0], cache_len[0], c_size, tq,
            jnp.minimum(sub_len, tq)[0], s_pad, r_pad, dtype=g_dtype)
        pallas_shared = (g_sel, p_mask)

    if streaming:
        def body(carry, layer_in):
            if pallas_shared is not None:
                lp, ac, tc, kvc, pp, ppT = layer_in
                pa = (pallas_shared[0], pallas_shared[1], ppT)
            else:
                lp, ac, tc, kvc, pp = layer_in
                pa = None
            y, new_ac, new_tc, new_kvc = _conformer_layer(
                lp, carry, ac, tc, kvc, pp, kv_mask, rel_idx, time_mask, cursor,
                cfg.n_heads, cache_keep, appended, use_pallas_ffn=use_pallas_ffn,
                use_pallas_conv=use_pallas_conv, pallas_att=pa)
            return y, (new_ac, new_tc, new_kvc)

        xs = (_layer_params_slice(enc_p["layers"]), att_cache0,
              time_cache0, kv_cache0, pos_proj)
        if pallas_shared is not None:
            xs = xs + (pos_projT,)
        if remat:
            body = jax.checkpoint(body)
        x, (new_att, new_time, new_kv) = lax.scan(body, x, xs)
    else:
        def body_off(carry, layer_in):
            lp, tc, pp = layer_in
            y, _, new_tc, _ = _conformer_layer(
                lp, carry, None, tc, None, pp, kv_mask, rel_idx, time_mask,
                cursor, cfg.n_heads, cache_keep, appended,
                use_pallas_ffn=use_pallas_ffn, use_pallas_conv=use_pallas_conv,
                use_flash_att=use_flash_att)
            return y, new_tc

        if remat:
            body_off = jax.checkpoint(body_off)
        x, _ = lax.scan(
            body_off, x, (_layer_params_slice(enc_p["layers"]), time_cache0,
                          pos_proj))

    out_len = jnp.minimum(sub_len, tq)
    new_state = None
    if streaming:
        if keep_vec is not None:
            cap = valid_cap_vec if valid_cap_vec is not None else keep_vec
        else:
            cap = valid_cap if valid_cap is not None else cache_keep
        out_len = jnp.minimum(out_len, cap)
        new_cache_len = jnp.minimum(cache_len + appended, c_size).astype(jnp.int32)
        new_cursor = ((cursor + appended) % max(c_size, 1)).astype(jnp.int32)
        new_state = EncoderState(new_att, new_time, new_kv, new_cache_len, new_cursor)
    return x, out_len, new_state


def precompute_pos_proj(params, cfg: ModelConfig, tq: int, c_size: int,
                        compute_dtype=jnp.float32) -> jnp.ndarray:
    """Per-layer positional projections for a fixed chunk shape — compute
    once per session instead of once per chunk. [L, Tq+C+Tq-1, D]."""
    pos_table = sinusoidal_pos_table(tq, c_size + tq, cfg.d_model, dtype=compute_dtype)
    return einsum("rd,lde->lre", pos_table,
                  params["encoder"]["layers"]["att_wpos"].astype(compute_dtype))


def offline_encode(params, cfg: ModelConfig, feats, lengths, compute_dtype=jnp.float32,
                   use_flash_att: bool = False, mask_pad_subsample: bool = False):
    """Full-utterance encoding (reference encoder.onnx equivalent).
    ``mask_pad_subsample``: see encode() — required for padded mixed-length
    batches to match exact-length per-utterance runs."""
    enc, out_len, _ = encode(params, cfg, feats, lengths, None,
                             compute_dtype=compute_dtype,
                             use_flash_att=use_flash_att,
                             mask_pad_subsample=mask_pad_subsample)
    return enc, out_len


# --- contract-layout state conversion (left-aligned valid prefix) -----------


def state_to_contract(state: EncoderState) -> Dict[str, jnp.ndarray]:
    """Internal ring-ordered [L,B,C,D] -> contract batch-first layouts:
    cache_last_channel [B, L, C, D] (chronological valid prefix),
    cache_last_time [B, L, D, K], cache_last_channel_len [B]."""
    l, b, c, d = state.att_cache.shape
    # chronological order: oldest valid entry sits at ring slot
    # (cursor - cache_len) mod C
    start = (state.cursor - state.cache_len) % max(c, 1)         # [B]
    idx = (start[:, None] + jnp.arange(c)[None, :]) % max(c, 1)  # [B, C]
    att = jnp.transpose(state.att_cache, (1, 0, 2, 3))           # [B, L, C, D]
    att = jnp.take_along_axis(att, idx[:, None, :, None], axis=2)
    valid = jnp.arange(c)[None, None, :, None] < state.cache_len[:, None, None, None]
    att = jnp.where(valid, att, 0)
    time = jnp.transpose(state.time_cache, (1, 0, 3, 2))         # [B, L, D, K]
    return {
        "cache_last_channel": att,
        "cache_last_time": time,
        "cache_last_channel_len": state.cache_len,
    }


def state_from_contract(d: Dict[str, jnp.ndarray], params=None) -> EncoderState:
    """Contract layout -> internal state. The projected kv_cache is derived
    state: when ``params`` is given it is reconstructed exactly
    (kv = raw_cache @ [W_k ++ W_v], linear because use_bias=false);
    without params it is zeroed and the state is NOT usable for further
    streaming steps."""
    att = jnp.transpose(d["cache_last_channel"], (1, 0, 2, 3))  # [L, B, C, D]
    c = att.shape[2]
    cache_len = d["cache_last_channel_len"].astype(jnp.int32)
    # chronological prefix maps directly onto ring slots [0, len) with
    # cursor = len mod C (slot j then has age len - j, as required)
    valid = (jnp.arange(c)[None, None, :, None]
             < cache_len[None, :, None, None])
    att = jnp.where(valid, att, 0)
    time = jnp.transpose(d["cache_last_time"], (1, 0, 3, 2))
    if params is not None:
        from trt_asr_tpu.ops.quant import QuantTensor, dequantize

        layers = params["encoder"]["layers"]
        wk, wv = layers["att_wk"], layers["att_wv"]
        if isinstance(wk, QuantTensor):
            wk, wv = dequantize(wk), dequantize(wv)
        wk = wk.astype(att.dtype)
        wv = wv.astype(att.dtype)
        kv = jnp.concatenate([einsum("lbcd,lde->lbce", att, wk),
                              einsum("lbcd,lde->lbce", att, wv)], axis=-1)
    else:
        kv = jnp.zeros(att.shape[:-1] + (2 * att.shape[-1],), att.dtype)
    return EncoderState(att, time, kv, cache_len, cache_len % max(c, 1))
