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
from trt_asr_tpu.ops.attention import rel_pos_attention, sinusoidal_pos_table
from trt_asr_tpu.ops.common import batch_norm_inference, glu, layer_norm, matmul, silu
from trt_asr_tpu.ops.conv import depthwise_conv1d, dw_striding_subsample, subsampled_length


class EncoderState(NamedTuple):
    """Streaming caches. att_cache right-aligned along axis 2."""

    att_cache: jnp.ndarray   # [L, B, C, D]
    time_cache: jnp.ndarray  # [L, B, K, D]
    cache_len: jnp.ndarray   # [B] int32 — valid suffix length of att_cache


def init_encoder_state(cfg: ModelConfig, batch: int, dtype=jnp.float32) -> EncoderState:
    return EncoderState(
        att_cache=jnp.zeros((cfg.num_layers, batch, cfg.att_cache_size, cfg.d_model), dtype),
        time_cache=jnp.zeros((cfg.num_layers, batch, cfg.conv_context_size, cfg.d_model), dtype),
        cache_len=jnp.zeros((batch,), jnp.int32),
    )


def reset_encoder_state_rows(state: EncoderState, row_mask: jnp.ndarray) -> EncoderState:
    """Zero the state of streams where row_mask[b] is True (stream add/remove
    in a batched server — reference analog: parakeet_reset_utterance)."""
    m_b = row_mask.reshape(1, -1, 1, 1)
    return EncoderState(
        att_cache=jnp.where(m_b, 0.0, state.att_cache).astype(state.att_cache.dtype),
        time_cache=jnp.where(m_b, 0.0, state.time_cache).astype(state.time_cache.dtype),
        cache_len=jnp.where(row_mask, 0, state.cache_len),
    )


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
    att_cache: jnp.ndarray,         # [B, C, D] right-aligned
    time_cache: jnp.ndarray,        # [B, K, D]
    pos_table: jnp.ndarray,         # [Tq + C + Tq - 1, D]
    kv_mask: jnp.ndarray,           # [B, C + Tq] bool
    time_mask: jnp.ndarray,         # [B, Tq] bool (valid current steps)
    n_heads: int,
    cache_keep: int,                # Tq - cache_drop (static)
    appended: jnp.ndarray,          # [B] = min(sub_len, cache_keep), dynamic
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, tq, d = x.shape
    k = time_cache.shape[1]

    # --- macaron FFN (1/2 residual) ---
    h = layer_norm(x, lp["ff1_ln_g"], lp["ff1_ln_b"])
    h = matmul(silu(matmul(h, lp["ff1_w1"])), lp["ff1_w2"])
    x = x + 0.5 * h

    # --- rel-pos self-attention over [cache ++ current] ---
    u = layer_norm(x, lp["att_ln_g"], lp["att_ln_b"])
    kv = jnp.concatenate([att_cache.astype(u.dtype), u], axis=1)
    att_params = {
        "wq": lp["att_wq"], "wk": lp["att_wk"], "wv": lp["att_wv"], "wo": lp["att_wo"],
        "wpos": lp["att_wpos"], "pos_bias_u": lp["att_bias_u"], "pos_bias_v": lp["att_bias_v"],
    }
    y = rel_pos_attention(att_params, u, kv, pos_table, n_heads, kv_mask=kv_mask)
    x = x + y
    new_att_cache = (_append_cache(att_cache, u[:, :cache_keep], appended)
                     if att_cache.shape[1] else att_cache)

    # --- convolution module ---
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
    h = layer_norm(x, lp["ff2_ln_g"], lp["ff2_ln_b"])
    h = matmul(silu(matmul(h, lp["ff2_w1"])), lp["ff2_w2"])
    x = x + 0.5 * h

    x = layer_norm(x, lp["out_ln_g"], lp["out_ln_b"])
    return x, new_att_cache, new_time_cache


def encode(
    params: Dict[str, Any],
    cfg: ModelConfig,
    feats: jnp.ndarray,            # [B, T, feat_in]
    lengths: jnp.ndarray,          # [B] int32 (valid feature frames)
    state: Optional[EncoderState] = None,
    *,
    drop_extra: int = 0,           # static: pre-encoded steps to drop (0 | drop_extra_pre_encoded)
    cache_drop: int = 0,           # static: trailing lookahead steps kept out of caches
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[EncoderState]]:
    """Returns (enc_out [B, Tq, D] in compute dtype, out_lengths [B], new_state).

    enc_out always has the full static Tq step axis; out_lengths gives the
    valid count (= min(sub_len - drop_extra, Tq - cache_drop)). Callers mask
    or slice. state=None selects pure offline behavior (no caches).
    """
    enc_p = params["encoder"]
    b = feats.shape[0]
    x = dw_striding_subsample(enc_p["pre_encode"], feats.astype(compute_dtype))
    sub_len = subsampled_length(lengths, cfg.stride_stages)
    if drop_extra:
        x = x[:, drop_extra:]
        sub_len = jnp.maximum(sub_len - drop_extra, 0)
    tq = x.shape[1]
    d = cfg.d_model

    streaming = state is not None
    if streaming:
        c_size = state.att_cache.shape[2]
        cache_len = state.cache_len
        att_cache0, time_cache0 = state.att_cache, state.time_cache
    else:
        c_size = 0
        cache_len = jnp.zeros((b,), jnp.int32)
        att_cache0 = jnp.zeros((cfg.num_layers, b, 0, d), compute_dtype)
        time_cache0 = jnp.zeros((cfg.num_layers, b, cfg.conv_context_size, d), compute_dtype)

    cache_keep = max(tq - cache_drop, 0)
    appended = jnp.minimum(sub_len, cache_keep).astype(jnp.int32)

    pos_table = sinusoidal_pos_table(tq, c_size + tq, d, dtype=compute_dtype)
    time_mask = jnp.arange(tq)[None, :] < sub_len[:, None]               # [B, Tq]
    cache_mask = jnp.arange(c_size)[None, :] >= (c_size - cache_len[:, None])
    kv_mask = jnp.concatenate([cache_mask, time_mask], axis=1)

    x = jnp.where(time_mask[:, :, None], x, 0)

    def body(carry, layer_in):
        xc = carry
        lp, ac, tc = layer_in
        y, new_ac, new_tc = _conformer_layer(
            lp, xc, ac, tc, pos_table, kv_mask, time_mask,
            cfg.n_heads, cache_keep, appended)
        return y, (new_ac, new_tc)

    x, (new_att, new_time) = lax.scan(
        body, x, (_layer_params_slice(enc_p["layers"]), att_cache0, time_cache0))

    out_len = jnp.minimum(sub_len, tq)
    new_state = None
    if streaming:
        out_len = jnp.minimum(out_len, cache_keep)
        new_cache_len = jnp.minimum(cache_len + appended, c_size).astype(jnp.int32)
        new_state = EncoderState(new_att, new_time, new_cache_len)
    return x, out_len, new_state


def offline_encode(params, cfg: ModelConfig, feats, lengths, compute_dtype=jnp.float32):
    """Full-utterance encoding (reference encoder.onnx equivalent)."""
    enc, out_len, _ = encode(params, cfg, feats, lengths, None, compute_dtype=compute_dtype)
    return enc, out_len


# --- contract-layout state conversion (left-aligned valid prefix) -----------


def state_to_contract(state: EncoderState) -> Dict[str, jnp.ndarray]:
    """Internal right-aligned [L,B,C,D] -> contract batch-first layouts:
    cache_last_channel [B, L, C, D] (valid prefix), cache_last_time
    [B, L, D, K], cache_last_channel_len [B]."""
    l, b, c, d = state.att_cache.shape
    # roll each batch row left by (C - len) so valid entries form a prefix
    shift = (c - state.cache_len).astype(jnp.int32)            # [B]
    idx = (jnp.arange(c)[None, :] + shift[:, None]) % max(c, 1)  # [B, C]
    att = jnp.transpose(state.att_cache, (1, 0, 2, 3))          # [B, L, C, D]
    att = jnp.take_along_axis(att, idx[:, None, :, None], axis=2)
    valid = jnp.arange(c)[None, None, :, None] < state.cache_len[:, None, None, None]
    att = jnp.where(valid, att, 0)
    time = jnp.transpose(state.time_cache, (1, 0, 3, 2))        # [B, L, D, K]
    return {
        "cache_last_channel": att,
        "cache_last_time": time,
        "cache_last_channel_len": state.cache_len,
    }


def state_from_contract(d: Dict[str, jnp.ndarray]) -> EncoderState:
    att = jnp.transpose(d["cache_last_channel"], (1, 0, 2, 3))  # [L, B, C, D]
    c = att.shape[2]
    cache_len = d["cache_last_channel_len"].astype(jnp.int32)
    shift = (c - cache_len).astype(jnp.int32)
    idx = (jnp.arange(c)[None, :] - shift[:, None]) % max(c, 1)
    att = jnp.take_along_axis(att, idx[None, :, :, None], axis=2)
    valid = jnp.arange(c)[None, None, :, None] >= (c - cache_len)[None, :, None, None]
    att = jnp.where(valid, att, 0)
    time = jnp.transpose(d["cache_last_time"], (1, 0, 3, 2))
    return EncoderState(att, time, cache_len)
