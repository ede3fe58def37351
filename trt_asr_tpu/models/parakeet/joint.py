"""RNNT-TDT joint network.

Contract (reference joint component, contract joint.*): raw logits
[..., 8198] = 8193 token head (8192 vocab + blank at 8192) ++ 5 duration
bins for durations (0,1,2,3,4). No log-softmax (normalization: logits).

``joint_single_step`` is the decode hot path: [B, D] x [B, P] -> [B, V].
The reference replicated the encoder frame across a T=16 TRT profile and
round-tripped 8198 logits to the host per step
(parakeet_trt.cpp:2918-2943) — here a step is three small matmuls that stay
on device inside the decode while_loop.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from trt_asr_tpu.ops.common import matmul


def _proj(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    out = matmul(x, p["w"])
    if p.get("b") is not None:
        out = out + p["b"].astype(out.dtype)
    return out


def joint_apply(params: Dict[str, Any], enc: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """enc [B, T, D], pred [B, U, P] -> logits [B, T, U, V]."""
    e = _proj(params["enc"], enc)[:, :, None, :]      # [B, T, 1, J]
    g = _proj(params["pred"], pred)[:, None, :, :]    # [B, 1, U, J]
    h = jnp.maximum(e + g, 0)
    return _proj(params["out"], h)


def joint_single_step(params: Dict[str, Any], enc_t: jnp.ndarray, g_u: jnp.ndarray) -> jnp.ndarray:
    """enc_t [B, D], g_u [B, P] -> logits [B, V]."""
    h = jnp.maximum(_proj(params["enc"], enc_t) + _proj(params["pred"], g_u), 0)
    return _proj(params["out"], h)


def joint_project_enc(params: Dict[str, Any], enc: jnp.ndarray) -> jnp.ndarray:
    """Precompute the encoder projection for a whole chunk [B, T, D] -> [B, T, J]
    so the decode loop's per-step work is only the pred+out projections."""
    return _proj(params["enc"], enc)


def joint_from_projected(params: Dict[str, Any], enc_proj_t: jnp.ndarray, g_u: jnp.ndarray) -> jnp.ndarray:
    h = jnp.maximum(enc_proj_t + _proj(params["pred"], g_u), 0)
    return _proj(params["out"], h)
