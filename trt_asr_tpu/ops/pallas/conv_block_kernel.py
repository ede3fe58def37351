"""Fused conformer convolution-module Pallas kernel (B=1 streaming).

One kernel call per layer replaces the ~10 XLA ops of the conv module
(LN -> pointwise1 -> GLU -> time-mask -> depthwise conv over the time
cache -> BatchNorm -> SiLU -> pointwise2 -> residual). At B=1 / Tq=8 each
op is microseconds of compute with fixed dispatch overhead (PERFNOTES: the
B=1 step is overhead-bound); both pointwise matrices fit VMEM (pw1
1024x2048 + pw2 1024x1024 = 6 MB bf16, 3 MB int8).

The depthwise conv unrolls its K=9 taps as shifted elementwise
multiply-adds on the [K + Tq + K, D] extended block (time cache ++ masked
current ++ zero lookahead) — the same VALID-conv arithmetic as
ops/conv.depthwise_conv1d, with no conv primitive needed.

int8 QuantTensor pointwise weights are consumed natively: converted at the
MXU operand (exact) with the dequant scale on the f32 accumulator — the
same math as ops/quant.q8_matmul.

Replaces (behaviorally): the conv module of the reference's TRT-compiled
NeMo encoder (contract encoder.conv_kernel_size, cache_last_time);
exactness vs the XLA path is tested in interpret mode and closed-loop
(tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_block_kernel(x_ref, ln_g_ref, ln_b_ref, pw1_ref, s1_ref, dw_ref,
                       bn_g_ref, bn_b_ref, bn_m_ref, bn_v_ref, pw2_ref,
                       s2_ref, tc_ref, mask_ref, y_ref, c_ref, *,
                       kk: int, tq_pad: int, wdtype):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)                                   # [Tq, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    u = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ln_g_ref[:] + ln_b_ref[:]

    hw = jnp.dot(u.astype(wdtype), pw1_ref[:].astype(wdtype),
                 preferred_element_type=f32) * s1_ref[:]        # [Tq, 2D]
    d = x.shape[1]
    c = hw[:, :d] * jax.nn.sigmoid(hw[:, d:])                   # GLU
    c = c * mask_ref[:]                                         # zero pad rows
    c_ref[:] = c                                                # cache update rows

    half = (kk - 1) // 2
    ext = jnp.concatenate(
        [tc_ref[:].astype(f32), c, jnp.zeros((half, d), f32)], axis=0)
    dw = dw_ref[:]                                              # [kk, D] f32
    cv = ext[0:tq_pad] * dw[0][None]
    for j in range(1, kk):                                      # unrolled taps
        cv = cv + ext[j : j + tq_pad] * dw[j][None]

    scale = bn_g_ref[:] * jax.lax.rsqrt(bn_v_ref[:] + 1e-5)
    cv = (cv - bn_m_ref[:]) * scale + bn_b_ref[:]               # BatchNorm
    cv = cv * jax.nn.sigmoid(cv)                                # SiLU
    y = jnp.dot(cv.astype(wdtype), pw2_ref[:].astype(wdtype),
                preferred_element_type=f32) * s2_ref[:]
    y_ref[:] = x + y


def _weight_parts(w):
    from trt_asr_tpu.ops.quant import QuantTensor

    if isinstance(w, QuantTensor):
        return w.q, w.s
    return w, jnp.ones((1, w.shape[-1]), jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_block_pallas(
    x: jnp.ndarray,                  # [Tq_pad, D] f32 residual stream
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,
    pw1, dw: jnp.ndarray,            # pw1 [D, 2D] | QuantTensor; dw [kk, D]
    bn_g, bn_b, bn_m, bn_v,
    pw2,                             # [D, D] | QuantTensor
    time_cache: jnp.ndarray,         # [K, D] left context (K = (kk-1)//2)
    mask: jnp.ndarray,               # [Tq_pad, 1] f32 valid-step mask
    *,
    interpret=None,
):
    """Returns (y [Tq_pad, D] f32 = x + conv_module(x), c [Tq_pad, D] f32 —
    the post-GLU activations whose first rows feed the time cache)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    tq_pad, d = x.shape
    kk = dw.shape[0]
    pw1_w, s1 = _weight_parts(pw1)
    pw2_w, s2 = _weight_parts(pw2)
    wdtype = jnp.bfloat16 if pw1_w.dtype == jnp.int8 else pw1_w.dtype
    kern = functools.partial(_conv_block_kernel, kk=kk, tq_pad=tq_pad,
                             wdtype=wdtype)
    y, c = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((tq_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((tq_pad, d), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        interpret=interpret,
    )(x, ln_g.astype(jnp.float32)[None], ln_b.astype(jnp.float32)[None],
      pw1_w, s1, dw.astype(jnp.float32),
      bn_g.astype(jnp.float32)[None], bn_b.astype(jnp.float32)[None],
      bn_m.astype(jnp.float32)[None], bn_v.astype(jnp.float32)[None],
      pw2_w, s2, time_cache, mask)
    return y, c


def _conv_ffn_ln_kernel(x_ref, cg_ref, cb_ref, pw1_ref, s1_ref, dw_ref,
                        bn_g_ref, bn_b_ref, bn_m_ref, bn_v_ref, pw2_ref,
                        s2_ref, tc_ref, mask_ref,
                        fg_ref, fb_ref, w1_ref, fs1_ref, w2_ref, fs2_ref,
                        og_ref, ob_ref, y_ref, c_ref, *,
                        kk: int, tq_pad: int, wdtype):
    """Conv module ++ FFN2 (0.5 residual) ++ output LayerNorm, one call.
    int8-weight path only (float weights exceed VMEM: ~23 MB bf16)."""
    f32 = jnp.float32

    def ln(v, g_ref, b_ref):
        mu = jnp.mean(v, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(v - mu), axis=-1, keepdims=True)
        return (v - mu) * jax.lax.rsqrt(var + 1e-5) * g_ref[:] + b_ref[:]

    x = x_ref[:].astype(f32)                                   # [Tq, D]
    d = x.shape[1]
    u = ln(x, cg_ref, cb_ref)
    hw = jnp.dot(u.astype(wdtype), pw1_ref[:].astype(wdtype),
                 preferred_element_type=f32) * s1_ref[:]
    c = hw[:, :d] * jax.nn.sigmoid(hw[:, d:])
    c = c * mask_ref[:]
    c_ref[:] = c
    half = (kk - 1) // 2
    ext = jnp.concatenate(
        [tc_ref[:].astype(f32), c, jnp.zeros((half, d), f32)], axis=0)
    dw = dw_ref[:]
    cv = ext[0:tq_pad] * dw[0][None]
    for j in range(1, kk):
        cv = cv + ext[j : j + tq_pad] * dw[j][None]
    scale = bn_g_ref[:] * jax.lax.rsqrt(bn_v_ref[:] + 1e-5)
    cv = (cv - bn_m_ref[:]) * scale + bn_b_ref[:]
    cv = cv * jax.nn.sigmoid(cv)
    x = x + jnp.dot(cv.astype(wdtype), pw2_ref[:].astype(wdtype),
                    preferred_element_type=f32) * s2_ref[:]

    # FFN2 (macaron half-residual)
    h = ln(x, fg_ref, fb_ref).astype(wdtype)
    h = jnp.dot(h, w1_ref[:].astype(wdtype),
                preferred_element_type=f32) * fs1_ref[:]
    h = (h * jax.nn.sigmoid(h)).astype(wdtype)                 # SiLU
    x = x + 0.5 * (jnp.dot(h, w2_ref[:].astype(wdtype),
                           preferred_element_type=f32) * fs2_ref[:])
    y_ref[:] = ln(x, og_ref, ob_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv_ffn_ln_pallas(
    x: jnp.ndarray,                  # [Tq_pad, D] f32 (post-attention)
    conv_ln_g, conv_ln_b, pw1, dw, bn_g, bn_b, bn_m, bn_v, pw2,
    time_cache, mask,
    ff_ln_g, ff_ln_b, ff_w1, ff_w2,  # FFN2 (int8 QuantTensors)
    out_ln_g, out_ln_b,
    *,
    interpret=None,
):
    """Fused conv module + FFN2 + out-LN (int8 weights required — the
    float tail exceeds VMEM). Returns (y, c) like conv_block_pallas but
    with y = out_ln(x + conv + 0.5*ffn2)."""
    from trt_asr_tpu.ops.quant import QuantTensor

    for w in (pw1, pw2, ff_w1, ff_w2):
        assert isinstance(w, QuantTensor), "conv_ffn_ln_pallas is int8-only"
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    tq_pad, d = x.shape
    kk = dw.shape[0]
    kern = functools.partial(_conv_ffn_ln_kernel, kk=kk, tq_pad=tq_pad,
                             wdtype=jnp.bfloat16)
    f32 = jnp.float32
    y, c = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((tq_pad, d), f32),
                   jax.ShapeDtypeStruct((tq_pad, d), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 22,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 2),
        interpret=interpret,
    )(x, conv_ln_g.astype(f32)[None], conv_ln_b.astype(f32)[None],
      pw1.q, pw1.s, dw.astype(f32),
      bn_g.astype(f32)[None], bn_b.astype(f32)[None],
      bn_m.astype(f32)[None], bn_v.astype(f32)[None],
      pw2.q, pw2.s, time_cache, mask,
      ff_ln_g.astype(f32)[None], ff_ln_b.astype(f32)[None],
      ff_w1.q, ff_w1.s, ff_w2.q, ff_w2.s,
      out_ln_g.astype(f32)[None], out_ln_b.astype(f32)[None])
    return y, c
