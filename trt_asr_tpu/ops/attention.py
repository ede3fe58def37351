"""Relative-position multi-head attention (Transformer-XL style), cache-aware.

Replaces the reference's TRT-compiled NeMo ``RelPositionMultiHeadAttention``
(behavioral contract: encoder.self_attention_model == "rel_pos",
untie_biases, per contracts/parakeet-tdt-0.6b-v3.json).

TPU-first design notes:

- The streaming KV cache is stored RIGHT-ALIGNED (newest entry at the last
  slot). With the cache right-aligned, key slot j sits at global offset j
  and queries at offset C+i, so the relative-distance index matrix
  ``idx[i, j] = Tq - 1 - i + j`` is STATIC — independent of the dynamic
  fill. One compiled program covers offline (C=0) and every streaming step;
  the fill level enters only through the boolean kv mask.
- The hot path caches PROJECTED k/v (``rel_pos_attention_kv``): per chunk
  only the Tq new positions go through the k/v projections instead of
  re-projecting all C+Tq cached positions (the contract's raw-input cache
  is maintained alongside for state export — see encoder.py). With
  use_bias=false the k/v projections are linear, so caching them is exact.
- The positional projection (pos_table @ W_pos) is input-independent; the
  session precomputes it once per (layer, shape) instead of per chunk.
"""

from __future__ import annotations

import math
import warnings
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.ops.common import einsum, matmul

# Trace-time accounting: the flash gating below is static (shapes /
# rel_idx None-ness), so a program compiled with use_flash=True may
# silently contain the XLA path. Perf harnesses snapshot these counters
# around compilation to verify a row labelled "flash" actually took the
# kernel (tools/perf_sweep.py).
flash_trace_counts = {"requested": 0, "taken": 0}


def sinusoidal_pos_table(tq: int, tkv: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal embeddings for relative distances, descending
    from (tkv-1) to -(tq-1). Shape [tq + tkv - 1, d_model].

    Matches the NeMo RelPositionalEncoding table layout (positions ordered
    max..min; sin on even indices, cos on odd).
    """
    positions = np.arange(tkv - 1, -tq, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(math.log(10000.0) / d_model))
    pe = np.zeros((positions.shape[0], d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    return jnp.asarray(pe, dtype=dtype)


def _rel_index_matrix(tq: int, tkv: int) -> np.ndarray:
    i = np.arange(tq)[:, None]
    j = np.arange(tkv)[None, :]
    return (tq - 1 - i + j).astype(np.int32)


def rel_pos_attention_kv(
    q: jnp.ndarray,              # [B, Tq, H, dh] (projected)
    k: jnp.ndarray,              # [B, Tkv, H, dh] (projected, cache ++ new)
    v: jnp.ndarray,              # [B, Tkv, H, dh]
    pos_proj: jnp.ndarray,       # [Tq+Tkv-1, H, dh] (pos_table @ W_pos)
    pos_bias_u: jnp.ndarray,     # [H, dh]
    pos_bias_v: jnp.ndarray,     # [H, dh]
    wo: jnp.ndarray,             # [D, D]
    kv_mask: Optional[jnp.ndarray] = None,  # [B, Tkv] bool, True = attend
    rel_idx: Optional[jnp.ndarray] = None,  # [B, Tq, Tkv] pos-table indices
                                            # (ring-ordered caches); default
                                            # static right-aligned formula
    use_flash: bool = False,                # offline (Tq==Tkv, no cache):
                                            # blocked kernel, no T^2 score
                                            # materialization in HBM
    use_shift_kernel: Optional[bool] = None,
                                            # None = auto: fused rel-shift
                                            # Pallas kernel on TPU offline
                                            # shapes (the XLA skew costs
                                            # ~120 ms/fwd at 30 s B=32 —
                                            # offline_att_ablation_sub.json)
) -> jnp.ndarray:
    """Attention core on pre-projected q/k/v. Returns [B, Tq, D].

    kv position order is arbitrary as long as ``rel_idx`` gives each
    (query, slot) pair the right relative-distance table index and
    ``kv_mask`` excludes invalid slots — attention is permutation-invariant
    over kv given those. This is what lets the ring-buffered cache feed in
    ring order with no reordering gathers."""
    b, tq, h, dh = q.shape
    tkv = k.shape[1]

    q_u = q + pos_bias_u.astype(q.dtype)[None, None]
    q_v = q + pos_bias_v.astype(q.dtype)[None, None]

    if rel_idx is None:
        if use_shift_kernel is None:
            # auto-gate: the fused kernel wins on TPU at offline shapes
            # (large Tq, static indices); CPU/test runs keep the XLA path
            # (numerics identical — tests assert). bf16 only: the in-kernel
            # dot runs the MXU's native pass — the f32 accuracy mode needs
            # the einsum wrapper's HIGHEST multi-pass, so it keeps XLA
            use_shift_kernel = (tq >= 128 and dh <= 128
                                and q.dtype == jnp.bfloat16
                                and jax.default_backend() == "tpu")
        if use_shift_kernel:
            # fused matmul+shift: the XLA skew below is ~zero-FLOP yet cost
            # ~120 ms/forward at 30 s B=32 (44% of the encoder) — XLA
            # lowers pad+misaligned-reshape+slice into tile-hostile copies
            # (artifacts/perf/offline_att_ablation_sub.json)
            from trt_asr_tpu.ops.pallas.rel_shift_kernel import \
                rel_pos_bias_shifted

            bd = rel_pos_bias_shifted(q_v, pos_proj, tkv=tkv)
        else:
            # static right-aligned offsets bd[t,s] = pd[t, tq-1-t+s]: the
            # Transformer-XL relative SHIFT (pad + reshape + slice) instead
            # of a [B,H,Tq,Tkv] gather — take_along_axis lowered to a
            # generic gather that dominated offline long-T encode (30 s:
            # encoder MFU 13% gathered vs 32+% shifted)
            pd = einsum("bthd,rhd->bhtr", q_v, pos_proj.astype(q.dtype))
            r = pd.shape[-1]
            padded = jnp.pad(pd, ((0, 0), (0, 0), (0, 0), (1, 0)))
            bd = padded.reshape(b, h, tq * (r + 1))[..., tq:] \
                .reshape(b, h, tq, r)[..., :tkv]
    else:
        pd = einsum("bthd,rhd->bhtr", q_v, pos_proj.astype(q.dtype))
        bd = jnp.take_along_axis(pd, rel_idx[:, None].astype(jnp.int32),
                                 axis=-1)

    if use_flash:
        flash_trace_counts["requested"] += 1
        if rel_idx is None and tq == tkv and dh <= 128:
            from trt_asr_tpu.ops.pallas.flash_att_kernel import \
                flash_bias_attention

            flash_trace_counts["taken"] += 1
            mask = kv_mask if kv_mask is not None \
                else jnp.ones((b, tkv), bool)
            out = flash_bias_attention(q_u, k, v, bd, mask)
            return matmul(out.astype(q.dtype), wo)
        reason = ("cached/ring kv (rel_idx given)" if rel_idx is not None
                  else f"tq={tq} != tkv={tkv}" if tq != tkv
                  else f"head_dim={dh} > 128")
        warnings.warn(f"use_flash requested but unavailable ({reason}); "
                      "falling back to the XLA attention path — do not "
                      "label this program 'flash' in perf artifacts",
                      stacklevel=2)

    ac = einsum("bthd,bshd->bhts", q_u, k)                       # [B,H,Tq,Tkv]
    scores = (ac + bd).astype(jnp.float32) / math.sqrt(dh)
    if kv_mask is not None:
        scores = jnp.where(kv_mask[:, None, None, :], scores, jnp.float32(-1e30))
    att = jax.nn.softmax(scores, axis=-1).astype(q.dtype)

    out = einsum("bhts,bshd->bthd", att, v).reshape(b, tq, h * dh)
    return matmul(out, wo)


def rel_pos_attention(
    params: Dict[str, jnp.ndarray],
    q_in: jnp.ndarray,          # [B, Tq, D]
    kv_in: jnp.ndarray,         # [B, Tkv, D] (right-aligned cache ++ current)
    pos_table: jnp.ndarray,     # [Tq+Tkv-1, D]
    n_heads: int,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unprojected-input convenience form (projects q/k/v/pos inside)."""
    b, tq, d = q_in.shape
    tkv = kv_in.shape[1]
    dh = d // n_heads
    q = matmul(q_in, params["wq"]).reshape(b, tq, n_heads, dh)
    k = matmul(kv_in, params["wk"]).reshape(b, tkv, n_heads, dh)
    v = matmul(kv_in, params["wv"]).reshape(b, tkv, n_heads, dh)
    p = matmul(pos_table.astype(q_in.dtype), params["wpos"]).reshape(-1, n_heads, dh)
    return rel_pos_attention_kv(q, k, v, p, params["pos_bias_u"],
                                params["pos_bias_v"], params["wo"], kv_mask)
