"""Blocked (flash-style) offline attention kernel with rel-pos bias.

The offline encode's XLA attention materializes per layer, at [B, H, T, T]:
f32 scores (ac + bd), the softmax result, and reads each back — at 30 s
utterances (T=375, B=32) that is ~144 MB per tensor per layer, and HBM
traffic, not FLOPs, caps the encoder at ~26% MFU
(artifacts/perf/offline_sweep_30s.json). This kernel streams K/V/bias in
[BK]-sized blocks with the online-softmax recurrence — scores and
probabilities never leave VMEM; the only T^2-sized HBM traffic left is ONE
bf16 read of the precomputed rel-pos bias (bd, the Transformer-XL shift of
q_v @ pos_proj — computed in XLA where the reshape trick is free).

Grid: (B*H, T/BQ, T/BK), j innermost; running max / sum / accumulator live
in VMEM scratch across the j sweep (sequential TPU grid), output written at
the last j block. bf16 operands on the MXU, f32 accumulation throughout —
the same numerics class as the XLA bf16 path (exactness vs it:
tests/test_pallas_kernels.py::test_flash_attention_matches_xla).

Replaces (behaviorally): the scores/softmax/context stages of
ops/attention.rel_pos_attention_kv for the offline (cache-free) path;
reference equivalent: the offline encoder.onnx attention subgraph that TRT
fuses at engine build (/root/reference/tools/export_onnx/export.py:614-660 exports it
(export_encoder); the contract pins self_attention_model == "rel_pos",
/root/reference/contracts/parakeet-tdt-0.6b-v3.contract.json).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, bd_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, scale: float, nj: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                             # [BQ, dh]
    k = k_ref[0]                                             # [BK, dh]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # kv masking (variable lengths + tp padding) arrives pre-folded into
    # bd as -1e9: a separate [B, T] mask operand cannot satisfy the TPU
    # (8, 128) block-tiling rule at block (1, BK), and the fold fuses
    # into the bias write on the XLA side for free.
    s = (s + bd_ref[0].astype(jnp.float32)) * scale          # [BQ, BK]

    bk = s.shape[1]
    dh = acc_ref.shape[1]
    # per-row scalars live as full [BQ, 128] panels (all lanes equal):
    # full-width loads/stores only; combine via static leading-lane slices
    m_prev = m_ref[:]                                        # [BQ, 128]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)                          # [BQ, 128]
    p = jnp.exp(s - m_new[:, :bk])                           # [BQ, BK] f32
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = m_new
    acc_ref[:] = acc_ref[:] * alpha[:, :dh] + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _fin():
        # guard fully-masked (padded) query rows: l == 0 -> emit 0, not NaN
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:, :dh], 1e-30)
                    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_bias_attention(
    q_u: jnp.ndarray,        # [B, T, H, dh] (query + pos_bias_u, projected)
    k: jnp.ndarray,          # [B, T, H, dh]
    v: jnp.ndarray,          # [B, T, H, dh]
    bd: jnp.ndarray,         # [B, H, T, T] rel-pos bias (unscaled)
    kv_mask: jnp.ndarray,    # [B, T] bool, True = attend
    *,
    interpret=None,
):
    """Returns the attention context [B, T, H*dh] (pre out-projection)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, t, h, dh = q_u.shape
    scale = 1.0 / math.sqrt(dh)
    bq = bk = min(128, _round_up(t, 8))
    tp = _round_up(t, bq)
    dtype = q_u.dtype

    def bhtd(x):                                             # [BH, Tp, dh]
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, dh)
        return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))

    qf, kf, vf = bhtd(q_u), bhtd(k), bhtd(v)
    # fold the kv mask into the bias (-1e9 on masked/padded kv columns —
    # bf16-representable, exp() underflows to exactly 0 after the running-
    # max subtraction); padded QUERY rows are sliced away on return
    neg = jnp.asarray(-1e9, dtype)
    bdm = jnp.where(kv_mask[:, None, None, :], bd.astype(dtype), neg)
    bdf = jnp.pad(bdm.reshape(b * h, t, t),
                  ((0, 0), (0, tp - t), (0, tp - t)),
                  constant_values=neg)

    ni, nj = tp // bq, tp // bk
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, nj=nj),
        grid=(b * h, ni, nj),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda bh, i, j: (bh, i, 0)),
            pl.BlockSpec((1, bk, dh), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, bk, dh), lambda bh, i, j: (bh, j, 0)),
            pl.BlockSpec((1, bq, bk), lambda bh, i, j: (bh, i, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda bh, i, j: (bh, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, dh), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),   # running max (col 0)
            pltpu.VMEM((bq, 128), jnp.float32),   # running sum (col 0)
            pltpu.VMEM((bq, dh), jnp.float32),    # context accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qf, kf, vf, bdf)
    out = out[:, :t].reshape(b, h, t, dh)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, t, h * dh)
