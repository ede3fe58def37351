"""Fused rel-pos bias kernel: the Transformer-XL shift computed AT the
matmul, never materialized skewed.

Measured pathology (artifacts/perf/offline_att_ablation_sub.json, 30 s
B=32 bf16, real TPU): the XLA offline attention's rel-pos bias term costs
126 ms of the 276 ms encoder — and only ~24 ms of that is the
[B,T,H,dh]x[R,H,dh] pd matmul; the remaining ~120 ms is the skew
(pad + misaligned flat reshape + slice) whose FLOP content is ZERO. XLA
lowers that chain into tile-hostile copies at ~2% of HBM bandwidth. The
r3 flash-kernel control missed it because it consumed the SAME
XLA-computed bd tensor.

This kernel computes the bias ALREADY SHIFTED: grid (B, H, T/BT); each
program runs one MXU matmul q_block [BT, dh] x pos^T [dh, R_pad] into a
VMEM accumulator and emits the per-row shifted window
``bd[i, s] = pd[i, (tq-1) - (t0+i) + s]`` with BT in-VMEM row copies —
the skew becomes VMEM addressing instead of an HBM-materialized layout
change.

Numerics: the kernel's bd output is BIT-EXACT vs the XLA skew on real
hardware (measured at T=375/384, h=8, dh=128; asserted in
tests/test_pallas_kernels.py). End-to-end bf16 offline encoder outputs
differ from the XLA-path program by <= 0.0625 max-abs at full size —
XLA's fusion/reassociation around the now-materialized bd changes bf16
rounding downstream, the same error class as bf16 mode's own rounding
(6.9e-2 vs the f32 oracle, PERFNOTES r2 ladder) and well under the
0.15-logit decode-safety perturbation bound the bf16/int8 fast modes are
WER-gated against. The f32 accuracy modes never take this kernel.

Reference role: the offline encoder attention subgraph TRT fuses at
engine build (/root/reference/tools/export_onnx/export.py:614-660); the
rel-pos semantics are the contract's self_attention_model == "rel_pos".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _shift_kernel(q_ref, pos_ref, o_ref, scr_ref, *, bt: int, s_pad: int,
                  c: int, t_pad: int):
    ti = pl.program_id(2)
    q = q_ref[0, 0]                                # [BT, dh]
    p = pos_ref[0]                                 # [R_pad, dh]
    pd = jax.lax.dot_general(
        q, p, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [BT, R_pad]
    # row i of block ti needs window pd[i, (c - ti*bt - i) + s]. Two stages:
    # 1) a fully STATIC shear (roll with per-sublane stride; shift0 is the
    #    last block's row-0 offset, in [-127, 0]) — Mosaic's DYNAMIC
    #    strided roll mis-rotates at some widths (measured: exact at
    #    width 512, off by 256 at width 768), the static form verifies
    #    exact on hardware across our shapes;
    # 2) a block-uniform 128-ALIGNED dynamic slice through VMEM scratch
    #    (dynamic lane offsets must be provably 128-aligned).
    shift0 = c - (t_pad - bt)       # in [0, bt-1]
    r_pad = pd.shape[1]
    # roll right by (i - shift0) per row i, split into a uniform rotation
    # and a pure shear: Mosaic rejects negative static shifts, silently
    # mis-rotates negative DYNAMIC shifts at some widths (measured 256-off
    # failures), and caps a strided roll's max per-row shift at the vreg
    # width (128) — the shear's 0..127 range is exactly the cap
    u = pltpu.roll(pd, (r_pad - shift0) % r_pad, axis=1)
    scr_ref[:] = pltpu.roll(u, 0, axis=1, stride=1, stride_axis=0)
    nt = t_pad // bt
    start = bt * (nt - 1 - ti)
    o_ref[0, 0] = scr_ref[:, pl.ds(start, s_pad)].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tkv", "interpret"))
def rel_pos_bias_shifted(q_v: jnp.ndarray,        # [B, Tq, H, dh]
                         pos_proj: jnp.ndarray,   # [R, H, dh], R = Tq+Tkv-1
                         *, tkv: int,
                         interpret: bool = False) -> jnp.ndarray:
    """bd [B, H, Tq, tkv] with bd[t, s] = (q_v[t] . pos_proj[Tq-1-t+s]) —
    the XLA path's einsum+shift, fused."""
    b, tq, h, dh = q_v.shape
    bt = 128          # block rows; also the alignment unit of the dynamic
    t_pad = _round_up(tq, bt)       # slice (caller gates tq >= 128)
    s_pad = _round_up(tkv, 128)
    r_pad = t_pad + s_pad           # stage-2 windows never wrap

    q = jnp.transpose(q_v, (0, 2, 1, 3))           # [B, H, Tq, dh]
    if t_pad != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad - tq), (0, 0)))
    p = pos_proj.astype(q_v.dtype)
    if r_pad != p.shape[0]:
        p = jnp.pad(p, ((0, max(r_pad - p.shape[0], 0)), (0, 0), (0, 0)))
        p = p[:r_pad]
    p = jnp.transpose(p, (1, 0, 2))                # [H, R_pad, dh]

    out = pl.pallas_call(
        functools.partial(_shift_kernel, bt=bt, s_pad=s_pad, c=tq - 1,
                          t_pad=t_pad),
        grid=(b, h, t_pad // bt),
        in_specs=[
            pl.BlockSpec((1, 1, bt, dh), lambda bi, hi, ti: (bi, hi, ti, 0)),
            pl.BlockSpec((1, r_pad, dh), lambda bi, hi, ti: (hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bt, s_pad),
                               lambda bi, hi, ti: (bi, hi, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, s_pad), q_v.dtype),
        scratch_shapes=[pltpu.VMEM((bt, r_pad), jnp.float32)],
        interpret=interpret,
    )(q, p)
    return out[:, :, :tq, :tkv]
