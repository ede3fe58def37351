"""Shared numeric primitives with an explicit precision policy.

The reference learned the hard way that TF32 matmuls break closed-loop
streaming parity (DECISION_LOG.md:76-79 — cache_time errors up to 0.361 with
TF32 vs 1.4e-4 without). The TPU analog is the default bf16 matmul pass for
f32 operands. Policy here: any matmul on float32 inputs uses
``Precision.HIGHEST`` (full f32); bf16 inputs use the MXU natively with f32
accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from trt_asr_tpu.ops.quant import QuantTensor, q8_matmul

# f32 matmul pass count on the MXU: HIGHEST = 6-pass (full f32-equivalent),
# HIGH = 3-pass (~1e-5 class), DEFAULT = 1-pass bf16 (the TF32-analog trap).
# Env knob TRT_ASR_F32_PRECISION in {highest, high, default}; read once.
_PRECISION_MODES = {
    "highest": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "default": lax.Precision.DEFAULT,
}
_F32_PRECISION = _PRECISION_MODES[
    os.environ.get("TRT_ASR_F32_PRECISION", "highest").lower()]


def set_f32_precision(mode: str) -> str:
    """Override the f32 matmul precision; returns the previous mode name.

    The global is consumed at TRACE time and is NOT a jit cache key — a
    caller switching modes must trace through a FRESH jitted callable per
    mode (e.g. re-jit the raw step function), otherwise the second mode
    silently reuses the first's compiled program. tools/perf_sweep.py's
    interleaved precision comparison is the intended user."""
    global _F32_PRECISION
    prev = next(k for k, v in _PRECISION_MODES.items() if v is _F32_PRECISION)
    _F32_PRECISION = _PRECISION_MODES[mode.lower()]
    return prev


def matmul(a: jnp.ndarray, b) -> jnp.ndarray:
    """a @ b with f32 accumulation and dtype-aware precision. ``b`` may be a
    QuantTensor (int8 weight-only quantization, ops/quant.py)."""
    if isinstance(b, QuantTensor):
        return q8_matmul(a, b)
    prec = _F32_PRECISION if a.dtype == jnp.float32 else None
    out = jnp.matmul(a, b, precision=prec, preferred_element_type=jnp.float32)
    return out.astype(a.dtype) if a.dtype == jnp.bfloat16 else out


def einsum(spec: str, *args: jnp.ndarray) -> jnp.ndarray:
    prec = _F32_PRECISION if args[0].dtype == jnp.float32 else None
    out = jnp.einsum(spec, *args, precision=prec, preferred_element_type=jnp.float32)
    return out.astype(args[0].dtype) if args[0].dtype == jnp.bfloat16 else out


def layer_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, stats in f32 (torch parity)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def batch_norm_inference(x: jnp.ndarray, gamma, beta, mean, var, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode BatchNorm over the channel (last) axis."""
    scale = gamma.astype(jnp.float32) * lax.rsqrt(var.astype(jnp.float32) + eps)
    bias = beta.astype(jnp.float32) - mean.astype(jnp.float32) * scale
    return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)
