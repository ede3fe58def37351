"""Fused conformer attention-block Pallas kernel (B=1 streaming hot path).

One kernel call per layer replaces the ~10 XLA ops of the attention block
(LN -> q/k/v projections -> rel-pos scores -> positional gather -> mask ->
softmax -> context -> out projection -> residual). At B=1 / Tq=6 these ops
are each microseconds of compute but pay fixed dispatch/fusion-boundary
overhead (PERFNOTES: B=1 is overhead-bound at ~45 us/op x ~360 ops); all
four projection matrices fit VMEM in bf16 (4 x 2 MB), so the whole block
runs out of VMEM with zero HBM round-trips between stages.

The rel-pos positional gather (take_along_axis in ops/attention.py:89) is
MXU-hostile; we exploit the row-shift structure of the ring rel-index —
``rel_idx[t, s] = r0[s] - t`` for BOTH cache and current slots — to turn it
into one small matmul per query row against a {0,1} selection tensor
``g_sel[t, r, s] = (r == r0[s] - t)`` built once per CHUNK outside the
kernel and shared across heads AND layers (selection by matmul is exact:
each output picks exactly one addend).

Replaces (behaviorally): reference TRT-compiled NeMo
RelPositionMultiHeadAttention (contract encoder.self_attention_model
rel_pos); exactness vs the XLA path is tested in f32 interpret mode and at
closed-loop parity in bf16 (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _att_block_kernel(x_ref, ln_g_ref, ln_b_ref, wq_ref, wk_ref, wv_ref,
                      wo_ref, sq_ref, sk_ref, sv_ref, so_ref, bu_ref, bv_ref,
                      posT_ref, kvc_ref, gsel_ref,
                      mask_ref, y_ref, u_ref, kn_ref, vn_ref, *,
                      n_heads: int, dh: int, c_size: int, tq_pad: int,
                      s_pad: int, wdtype):
    f32 = jnp.float32
    x = x_ref[:].astype(f32)                                    # [Tq, D]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    u = (x - mu) * jax.lax.rsqrt(var + 1e-5) * ln_g_ref[:] + ln_b_ref[:]
    u_ref[:] = u
    uc = u.astype(wdtype)

    # int8 weights enter as stored and are converted at the MXU operand
    # (exact: |q| <= 127); the dequant scale rides the f32 accumulator —
    # identical math to ops/quant.q8_matmul. Float weights pass scale 1.
    q = jnp.dot(uc, wq_ref[:].astype(wdtype),
                preferred_element_type=f32) * sq_ref[:]          # [Tq, D]
    k_new = jnp.dot(uc, wk_ref[:].astype(wdtype),
                    preferred_element_type=f32) * sk_ref[:]
    v_new = jnp.dot(uc, wv_ref[:].astype(wdtype),
                    preferred_element_type=f32) * sv_ref[:]
    kn_ref[:] = k_new
    vn_ref[:] = v_new

    scale = f32(1.0 / math.sqrt(dh))
    neg = f32(-1e30)
    mask = mask_ref[:]                                           # [1, S]
    ctx_cols = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh_u = (q[:, sl] + bu_ref[h, :][None]).astype(wdtype)    # [Tq, dh]
        qh_v = (q[:, sl] + bv_ref[h, :][None]).astype(wdtype)
        # keys/values: ring cache slots [0, C) ++ current [C, C+Tq), zero pad
        kh = jnp.concatenate(
            [kvc_ref[:, sl].astype(wdtype), k_new[:, sl].astype(wdtype),
             jnp.zeros((s_pad - c_size - tq_pad, dh), wdtype)], axis=0)
        vh = jnp.concatenate(
            [kvc_ref[:, dh * n_heads + h * dh : dh * n_heads + (h + 1) * dh]
             .astype(wdtype), v_new[:, sl].astype(wdtype),
             jnp.zeros((s_pad - c_size - tq_pad, dh), wdtype)], axis=0)
        ac = jax.lax.dot_general(qh_u, kh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)     # [Tq, S]
        m = jnp.dot(qh_v, posT_ref[sl, :], preferred_element_type=f32)  # [Tq, R]
        mb = m.astype(wdtype)
        bd_rows = [jnp.dot(mb[t : t + 1], gsel_ref[t],
                           preferred_element_type=f32)           # [1, S]
                   for t in range(tq_pad)]
        bd = jnp.concatenate(bd_rows, axis=0)
        scores = (ac + bd) * scale
        scores = jnp.where(mask > 0, scores, neg)
        p = jax.nn.softmax(scores, axis=-1)                      # f32 [Tq, S]
        ctx_cols.append(jnp.dot(p.astype(wdtype), vh,
                                preferred_element_type=f32))     # [Tq, dh]
    ctx = jnp.concatenate(ctx_cols, axis=-1)                     # [Tq, D]
    y = jnp.dot(ctx.astype(wdtype), wo_ref[:].astype(wdtype),
                preferred_element_type=f32) * so_ref[:]
    y_ref[:] = x + y


def build_rel_selection(cursor: jnp.ndarray, cache_len: jnp.ndarray,
                        c_size: int, tq_pad: int, valid_tq: jnp.ndarray,
                        s_pad: int, r_pad: int,
                        dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-chunk positional-selection tensor + attention mask, shared by all
    layers. r0[s] = (C+Tq-1) - age[s] for ring slots, (C+Tq-1) + j for the
    current steps; g_sel[t, r, s] = (r == r0[s] - t). Invalid/padded slots
    get r0 = -1 (matches nothing) and mask 0."""
    base = c_size + tq_pad - 1
    age = ((cursor - 1 - jnp.arange(c_size)) % max(c_size, 1)) + 1     # [C]
    cache_ok = age <= cache_len
    r0_cache = jnp.where(cache_ok, base - age, -10 * r_pad)
    r0_cur = base + jnp.arange(tq_pad)
    cur_ok = jnp.arange(tq_pad) < valid_tq
    r0 = jnp.concatenate([
        r0_cache, jnp.where(cur_ok, r0_cur, -10 * r_pad),
        jnp.full((s_pad - c_size - tq_pad,), -10 * r_pad)])            # [S]
    t = jnp.arange(tq_pad)[:, None, None]
    r = jnp.arange(r_pad)[None, :, None]
    g_sel = (r == (r0[None, None, :] - t)).astype(dtype)               # [T,R,S]
    mask = jnp.concatenate([cache_ok, cur_ok,
                            jnp.zeros((s_pad - c_size - tq_pad,), bool)])
    return g_sel, mask[None].astype(jnp.float32)


def _weight_parts(w):
    """(stored_array, scale_row) for a float weight or a QuantTensor."""
    from trt_asr_tpu.ops.quant import QuantTensor

    if isinstance(w, QuantTensor):
        return w.q, w.s
    return w, jnp.ones((1, w.shape[-1]), jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_heads", "interpret"))
def att_block_pallas(
    x: jnp.ndarray,          # [Tq_pad, D] f32 (post-FFN1 residual stream)
    ln_g: jnp.ndarray, ln_b: jnp.ndarray,           # [D]
    wq, wk, wv, wo,          # [D, D] float, or QuantTensor (int8 + scale)
    bias_u: jnp.ndarray, bias_v: jnp.ndarray,       # [H, dh]
    posT: jnp.ndarray,       # [D, R_pad] pos_proj transposed (zero-padded)
    kv_cache: jnp.ndarray,   # [C, 2D] ring-ordered projected k ++ v
    g_sel: jnp.ndarray,      # [Tq_pad, R_pad, S_pad] from build_rel_selection
    kv_mask: jnp.ndarray,    # [1, S_pad] f32
    *,
    n_heads: int,
    interpret=None,
):
    """Returns (y [Tq_pad, D] f32 = x + attention, u (LN'd x), k_new, v_new).
    Float weights' dtype selects the MXU input dtype (bf16 production, f32
    interpret-mode exactness tests); int8 QuantTensor weights always compute
    bf16 with the dequant scale on the f32 accumulator (VMEM- and
    HBM-halved vs bf16)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    tq_pad, d = x.shape
    dh = d // n_heads
    c_size = kv_cache.shape[0]
    s_pad = g_sel.shape[2]
    wq, sq = _weight_parts(wq)
    wk, sk = _weight_parts(wk)
    wv, sv = _weight_parts(wv)
    wo, so = _weight_parts(wo)
    wdtype = jnp.bfloat16 if wq.dtype == jnp.int8 else wq.dtype
    kern = functools.partial(
        _att_block_kernel, n_heads=n_heads, dh=dh, c_size=c_size,
        tq_pad=tq_pad, s_pad=s_pad, wdtype=wdtype)
    y, u, kn, vn = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((tq_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((tq_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((tq_pad, d), jnp.float32),
                   jax.ShapeDtypeStruct((tq_pad, d), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 17,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=interpret,
    )(x, ln_g.astype(jnp.float32)[None], ln_b.astype(jnp.float32)[None],
      wq, wk, wv, wo, sq, sk, sv, so,
      bias_u.astype(jnp.float32), bias_v.astype(jnp.float32),
      posT, kv_cache, g_sel, kv_mask)
    return y, u, kn, vn
