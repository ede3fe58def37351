"""Int8 weight-only quantization primitives (TPU-first).

Reference parity: the reference's engine-build tooling selects TRT builder
precisions (fp16 kernels; int8 available via the same builder flags —
/root/reference/tools/build_trt, contract trt.profiles). The TPU-native
equivalent is not a builder pass but a weight REPRESENTATION: weights live
in HBM as int8 with per-output-channel f32 scales, halving weight bandwidth
vs bf16 (the B=1 streaming bottleneck is weight reads, PERFNOTES).

Exactness structure:
- int8 -> bf16 conversion is EXACT (|q| <= 127 < 2^8; bf16 holds integers
  to 256), so the MXU consumes the quantized integers losslessly.
- per-OUTPUT-channel scales commute with the contraction, so dequant
  collapses to one per-channel multiply on the f32 accumulator:
  x @ (q * s) == (x @ q) * s  exactly.

Two activation policies for f32-activation callers (TRT_ASR_Q8_ACT, read
once, static under jit):
- "bf16" (fast, default): activations rounded to bf16, one MXU pass — the
  bf16-mode speed class, but the residual stream stays f32 so rounding does
  not compound across layers.
- "split" (accurate): activations split a = hi + lo into two exact bf16
  operands; two MXU passes against the exact integer weights reproduce the
  f32-activation product to ~2^-16 relative (the weights contribute zero
  split error). ~2x matmul cost, still half the weight bandwidth.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp

# activation policy for f32 callers; bf16 callers always use one pass
_Q8_ACT = os.environ.get("TRT_ASR_Q8_ACT", "bf16").lower()
if _Q8_ACT not in ("bf16", "split"):
    import warnings

    warnings.warn(f"TRT_ASR_Q8_ACT={_Q8_ACT!r} unknown; using 'bf16'")
    _Q8_ACT = "bf16"


class QuantTensor(NamedTuple):
    """int8 weight + per-output-channel scale. Registered as a pytree via
    NamedTuple: slices cleanly through lax.scan (leading layer axis) and
    jax.device_put; excluded from float casts by dtype."""

    q: jnp.ndarray   # int8 [..., in, out]
    s: jnp.ndarray   # f32  [..., 1, out]


def quantize_tensor(w: jnp.ndarray) -> QuantTensor:
    """Symmetric per-output-channel (last axis) int8 quantization.
    w [..., in, out]; scale = amax over the contraction (in) axis / 127."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return QuantTensor(q, s)


def dequantize(t: QuantTensor, dtype=jnp.float32) -> jnp.ndarray:
    return (t.q.astype(jnp.float32) * t.s).astype(dtype)


def q8_matmul(a: jnp.ndarray, t: QuantTensor) -> jnp.ndarray:
    """a @ dequantize(t), computed as (a @ q) * s with f32 accumulation.
    Output dtype follows the activation dtype (matches ops.common.matmul)."""
    w = t.q.astype(jnp.bfloat16)                      # exact
    if a.dtype == jnp.float32 and _Q8_ACT == "split":
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = (jnp.matmul(hi, w, preferred_element_type=jnp.float32)
               + jnp.matmul(lo, w, preferred_element_type=jnp.float32))
    else:
        out = jnp.matmul(a.astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)
    out = out * t.s
    return out.astype(a.dtype) if a.dtype == jnp.bfloat16 else out
