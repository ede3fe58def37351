"""Fused conformer FFN Pallas kernel: LayerNorm + W1 + SiLU + W2 + scaled
residual in ONE kernel.

The XLA path spends ~7 ops per FFN (LN stats, normalize, affine, matmul,
silu, matmul, residual); at streaming shapes (x is [B*6, 1024]) per-op
overhead dominates (PERFNOTES.md: ~45 us/op on this chip). This kernel
makes each FFN one pallas_call. The expansion dimension is gridded so the
full-size weights (W1+W2 = 16 MB bf16) never exceed VMEM: grid step k
computes silu(ln(x) @ W1[:, k]) @ W2[k, :] and accumulates

    out = x + scale * sum_k contrib_k

with the first step initializing out = x + scale * contrib_0. LayerNorm is
recomputed per grid step (tiny [T, D] work) to avoid a scratch round trip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ffn_kernel(x_ref, g_ref, b_ref, w1_ref, w2_ref, s1_ref, s2_ref, out_ref,
                *, scale: float, d_valid: int, wdtype):
    k = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)                      # [T, D_pad]
    d_pad = x.shape[1]
    if d_valid != d_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        mask = col < d_valid
        xm = jnp.where(mask, x, 0.0)
    else:
        mask = None
        xm = x
    mean = jnp.sum(xm, axis=1, keepdims=True) / d_valid
    cent = xm - mean
    if mask is not None:
        cent = jnp.where(mask, cent, 0.0)
    var = jnp.sum(cent * cent, axis=1, keepdims=True) / d_valid
    ln = cent * jax.lax.rsqrt(var + 1e-5)
    ln = (ln * g_ref[:] + b_ref[:]).astype(wdtype)

    # int8 weights convert at the MXU operand (exact); dequant scales ride
    # the f32 accumulator (ops/quant.py). Float weights pass scale 1.
    h = jnp.dot(ln, w1_ref[:].astype(wdtype),
                preferred_element_type=jnp.float32) * s1_ref[:]
    h = (h * jax.nn.sigmoid(h)).astype(wdtype)            # SiLU
    contrib = jnp.dot(h, w2_ref[:].astype(wdtype),
                      preferred_element_type=jnp.float32) * s2_ref[:]

    @pl.when(k == 0)
    def _():
        out_ref[:] = x + scale * contrib

    @pl.when(k != 0)
    def _():
        out_ref[:] = out_ref[:] + scale * contrib


def fused_ffn_pallas(x: jnp.ndarray, ln_g: jnp.ndarray, ln_b: jnp.ndarray,
                     w1, w2, *, scale: float = 0.5,
                     interpret: Optional[bool] = None) -> jnp.ndarray:
    """x [..., T, D] -> x + scale * FFN(LN(x)); returns x.dtype.
    w1/w2 may be float arrays or int8 QuantTensors (consumed natively).

    interpret=None auto-selects interpreter mode off-TPU (CPU tests)."""
    from trt_asr_tpu.ops.quant import QuantTensor

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")

    def parts(w):
        if isinstance(w, QuantTensor):
            return w.q, w.s
        return w, jnp.ones((1, w.shape[1]), jnp.float32)

    orig_shape = x.shape
    orig_dtype = x.dtype
    d = x.shape[-1]
    w1, s1 = parts(w1)
    e = w1.shape[1]
    w2, s2 = parts(w2)
    wdtype = jnp.bfloat16 if w1.dtype == jnp.int8 else w1.dtype
    x2 = x.reshape(-1, d)
    t = x2.shape[0]
    t_pad = _round_up(max(t, 1), 8)
    d_pad = _round_up(d, 128)

    # grid the expansion dim so W1+W2 stay under ~8 MB per step
    bytes_per_col = d_pad * 2 * jnp.dtype(w1.dtype).itemsize
    e_blk = max(min(e, (6 << 20) // max(bytes_per_col, 1)), 128)
    e_blk = _round_up(min(e_blk, e), 128)
    e_pad = _round_up(e, e_blk)
    grid = e_pad // e_blk

    xp = jnp.pad(x2, ((0, t_pad - t), (0, d_pad - d)))
    gp = jnp.pad(ln_g.astype(jnp.float32), (0, d_pad - d))[None]
    bp = jnp.pad(ln_b.astype(jnp.float32), (0, d_pad - d))[None]
    w1p = jnp.pad(w1, ((0, d_pad - d), (0, e_pad - e)))
    w2p = jnp.pad(w2, ((0, e_pad - e), (0, d_pad - d)))
    s1p = jnp.pad(s1.astype(jnp.float32), ((0, 0), (0, e_pad - e)),
                  constant_values=1.0)
    s2p = jnp.pad(s2.astype(jnp.float32), ((0, 0), (0, d_pad - d)),
                  constant_values=1.0)

    out = pl.pallas_call(
        functools.partial(_ffn_kernel, scale=float(scale), d_valid=d,
                          wdtype=wdtype),
        out_shape=jax.ShapeDtypeStruct((t_pad, d_pad), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((t_pad, d_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_pad, e_blk), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, d_pad), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_blk), lambda k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_pad), lambda k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t_pad, d_pad), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, gp, bp, w1p, w2p, s1p, s2p)
    return out[:t, :d].reshape(orig_shape).astype(orig_dtype)
