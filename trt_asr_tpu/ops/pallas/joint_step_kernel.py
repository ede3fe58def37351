"""Fused TDT joint decode-step Pallas kernel.

One decode-loop iteration's joint work — pred projection, bias add, ReLU,
output projection, token argmax (with optional blank penalty) and duration
argmax — fused into a single VMEM-resident kernel:

    h      = relu(enc_proj_t + g @ W_pred + b_pred + b_enc')   [B, J]
    logits = h @ W_out + b_out                                  [B, V]
    best_tok = argmax(logits[:ths]); best_dur = argmax(logits[ths:ths+nd])

The XLA path issues ~8 separate ops per while_loop iteration; at decode
shapes (B small, V=8198) each op's fixed overhead dominates
(PERFNOTES.md), so fusion targets op count, not FLOPs. The full-size
weights fit VMEM: W_out 640x8320 bf16 ≈ 10.6 MB + W_pred 640x640.

Used by the decode loop when RuntimeConfig.use_pallas_decode is set (the
XLA path stays the default until the kernel is validated faster on the
target chip; parity is tested in both interpret and compiled modes).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _joint_step_kernel(e_ref, g_ref, wp_ref, bp_ref, wo_ref, bo_ref,
                       sp_ref, so_ref,
                       tok_ref, dur_ref, logit_ref, *, ths: int, ndur: int,
                       blank_id: int, blank_penalty: float, wdtype):
    # int8 weights convert at the MXU operand (exact, |q|<=127); the dequant
    # scale rides the f32 accumulator (ops/quant.py). Floats pass scale 1.
    g = g_ref[:]                                                   # [B, P]
    h = (e_ref[:]
         + jnp.dot(g, wp_ref[:].astype(wdtype),
                   preferred_element_type=jnp.float32) * sp_ref[:]
         + bp_ref[:])
    h = jnp.maximum(h, 0.0).astype(wdtype)
    logits = jnp.dot(h, wo_ref[:].astype(wdtype),
                     preferred_element_type=jnp.float32) * so_ref[:] + bo_ref[:]
    b, v_pad = logits.shape

    col = jax.lax.broadcasted_iota(jnp.int32, (b, v_pad), 1)
    neg = jnp.float32(-1e30)
    tok_logits = jnp.where(col < ths, logits, neg)
    if blank_penalty:
        tok_logits = jnp.where(col == blank_id, tok_logits - blank_penalty, tok_logits)
    dur_logits = jnp.where((col >= ths) & (col < ths + ndur), logits, neg)

    tok_ref[0, :] = jnp.argmax(tok_logits, axis=1).astype(jnp.int32)
    dur_ref[0, :] = (jnp.argmax(dur_logits, axis=1) - ths).astype(jnp.int32)
    logit_ref[:] = logits


def pad_joint_weights(joint_params, dtype=None):
    """Pre-pad the joint weights to lane multiples ONCE (outside the decode
    loop) so per-iteration kernel calls don't re-pad the 10 MB output
    projection. int8 QuantTensor weights stay int8 (the kernel consumes
    them natively — half the VMEM of bf16, a quarter of f32). Returns
    (wp, bp, wo, bo, sp, so) padded; sp/so are dequant scale rows (ones
    for float weights)."""
    from trt_asr_tpu.ops.quant import QuantTensor

    def parts(w):
        if isinstance(w, QuantTensor):
            return w.q, w.s[0]
        return w, jnp.ones((w.shape[1],), jnp.float32)

    pred_w, pred_s = parts(joint_params["pred"]["w"])
    out_w, out_s = parts(joint_params["out"]["w"])
    pred_b = joint_params["pred"]["b"]
    out_b = joint_params["out"]["b"]
    if dtype is None:
        dtype = jnp.bfloat16 if out_w.dtype == jnp.int8 else out_w.dtype
    p, j = pred_w.shape
    v = out_w.shape[1]
    p_pad, j_pad, v_pad = _round_up(p, 128), _round_up(j, 128), _round_up(v, 128)

    def cast_w(w):
        return w if w.dtype == jnp.int8 else w.astype(dtype)

    wp = jnp.pad(cast_w(pred_w), ((0, p_pad - p), (0, j_pad - j)))
    bp = jnp.pad(pred_b.astype(jnp.float32), (0, j_pad - j))[None]
    wo = jnp.pad(cast_w(out_w), ((0, j_pad - j), (0, v_pad - v)))
    bo = jnp.pad(out_b.astype(jnp.float32), (0, v_pad - v))[None]
    sp = jnp.pad(pred_s.astype(jnp.float32), (0, j_pad - j),
                 constant_values=1.0)[None]
    so = jnp.pad(out_s.astype(jnp.float32), (0, v_pad - v),
                 constant_values=1.0)[None]
    return wp, bp, wo, bo, sp, so


def joint_step_pallas_prepadded(enc_proj_t, g, wp, bp, wo, bo, sp=None,
                                so=None, *, ths: int,
                                ndur: int, blank_id: int,
                                blank_penalty: float = 0.0,
                                interpret=None):
    """Kernel call on pre-padded weights. enc_proj_t [B, J], g [B, P]
    (unpadded); returns (best_tok [B], best_dur_idx [B], logits [B, V_pad]).
    interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, j = enc_proj_t.shape
    p = g.shape[1]
    b_pad = _round_up(b, 8)
    wdtype = jnp.bfloat16 if wp.dtype == jnp.int8 else wp.dtype
    if sp is None:
        sp = jnp.ones((1, wp.shape[1]), jnp.float32)
    if so is None:
        so = jnp.ones((1, wo.shape[1]), jnp.float32)
    e = jnp.pad(enc_proj_t.astype(jnp.float32),
                ((0, b_pad - b), (0, wp.shape[1] - j)))
    gp = jnp.pad(g.astype(wdtype), ((0, b_pad - b), (0, wp.shape[0] - p)))
    tok, dur, logits = pl.pallas_call(
        functools.partial(_joint_step_kernel, ths=ths, ndur=ndur,
                          blank_id=blank_id, blank_penalty=float(blank_penalty),
                          wdtype=wdtype),
        out_shape=(
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, b_pad), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, wo.shape[1]), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(e, gp, wp, bp, wo, bo, sp, so)
    return tok[0, :b], dur[0, :b], logits[:b]


@functools.partial(jax.jit, static_argnames=("ths", "ndur", "blank_id",
                                             "blank_penalty", "interpret"))
def joint_step_pallas(
    enc_proj_t: jnp.ndarray,     # [B, J] f32 (enc projection + enc bias)
    g: jnp.ndarray,              # [B, P]
    pred_w: jnp.ndarray,         # [P, J]
    pred_b: jnp.ndarray,         # [J]
    out_w: jnp.ndarray,          # [J, V]
    out_b: jnp.ndarray,          # [V]
    *,
    ths: int,
    ndur: int,
    blank_id: int,
    blank_penalty: float = 0.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (best_tok [B] int32, best_dur_idx [B] int32, logits [B, V])."""
    from trt_asr_tpu.ops.quant import QuantTensor

    v = (out_w.q if isinstance(out_w, QuantTensor) else out_w).shape[1]
    padded = pad_joint_weights(
        {"pred": {"w": pred_w, "b": pred_b}, "out": {"w": out_w, "b": out_b}})
    tok, dur, logits = joint_step_pallas_prepadded(
        enc_proj_t, g, *padded, ths=ths, ndur=ndur, blank_id=blank_id,
        blank_penalty=blank_penalty, interpret=interpret)
    return tok, dur, logits[:, :v]
