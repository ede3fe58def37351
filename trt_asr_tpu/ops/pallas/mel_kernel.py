"""Fused window+DFT+power+mel+log Pallas kernel.

One VMEM-resident pipeline per 128-frame tile:

    frames[128, 512] --MXU--> re/im[128, 384] --VPU--> power --MXU-->
    mel[128, n_mels] --VPU--> log(mel + floor)

All intermediates stay in VMEM; HBM traffic is exactly one read of the frames
tile and one write of the output tile (the f32 spectrum never round-trips to
HBM, unlike a composed rfft+matmul graph). Constants are zero-padded to lane
multiples (win 400->512, bins 257->384) — zero rows/columns are exact no-ops
for the DFT/mel matmuls.

Replaces the reference's host-CPU Rust frontend (rust/features/src/lib.rs)
with on-device compute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_T = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _mel_kernel(frames_ref, wcos_ref, wsin_ref, mel_ref, out_ref, *, log_floor: float):
    f = frames_ref[:]
    re = jnp.dot(f, wcos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, wsin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(mel + log_floor)


@functools.partial(jax.jit, static_argnums=(4,))
def logmel_from_frames_pallas(frames, wcos, wsin, mel, log_floor: float):
    """frames [..., T, win] f32 -> log-mel [..., T, n_mels] f32."""
    lead = frames.shape[:-2]
    win = frames.shape[-1]
    n_bins, n_mels = mel.shape
    t_total = int(np.prod(lead, dtype=np.int64)) * frames.shape[-2] if lead else frames.shape[-2]
    x = frames.reshape(t_total, win)

    win_p = _round_up(win, 128)
    bins_p = _round_up(n_bins, 128)
    mels_p = _round_up(n_mels, 128)
    t_p = _round_up(max(t_total, 1), _TILE_T)

    x = jnp.pad(x, ((0, t_p - t_total), (0, win_p - win)))
    wcos_p = jnp.pad(wcos, ((0, win_p - win), (0, bins_p - n_bins)))
    wsin_p = jnp.pad(wsin, ((0, win_p - win), (0, bins_p - n_bins)))
    # Pad mel with a tiny positive column bias? No: padded mel columns produce
    # log(0 + floor) in padded output columns, which we slice away below.
    mel_p = jnp.pad(mel, ((0, bins_p - n_bins), (0, mels_p - n_mels)))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, log_floor=float(log_floor)),
        out_shape=jax.ShapeDtypeStruct((t_p, mels_p), jnp.float32),
        grid=(t_p // _TILE_T,),
        in_specs=[
            pl.BlockSpec((_TILE_T, win_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win_p, bins_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win_p, bins_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_p, mels_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_T, mels_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x, wcos_p, wsin_p, mel_p)

    out = out[:t_total, :n_mels]
    return out.reshape(*lead, frames.shape[-2], n_mels) if lead else out
