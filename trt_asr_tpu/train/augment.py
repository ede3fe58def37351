"""SpecAugment (Park et al., 2019) for log-mel training batches.

Beyond-reference capability: the reference is inference-only, but the
model family it serves is *trained* with SpecAugment (NeMo's
parakeet-tdt recipe: SpectrogramAugmentation with freq_masks=2,
freq_width=27, time_masks=10, adaptive time_width=0.05), so a framework
claiming the training story needs it. Pure function of an explicit PRNG
key — jit-friendly (static mask counts, traced positions), vmap/dp-shard
transparent (every op is per-row).

Masking semantics:
- ``freq_masks`` bands of width U[0, freq_width] over the mel axis;
- ``time_masks`` bands over the time axis; ``time_width`` < 1 is the
  NeMo "adaptive" mode — the maximum width is that fraction of each
  row's OWN valid length, so short utterances are not obliterated;
- masks never touch padding (they are clipped to [0, feat_len)); the
  masked value is 0.0 — the mean of per-feature-normalized inputs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _band_mask(key, n_masks: int, axis_len: int, max_width,
               valid_len) -> jnp.ndarray:
    """[B, axis_len] bool: True where masked. max_width/valid_len: [B]."""
    k_w, k_s = jax.random.split(key)
    b = valid_len.shape[0]
    # widths ~ U{0..max_width} per (row, mask); starts ~ U[0, valid - w)
    w = jax.random.randint(k_w, (b, n_masks), 0,
                           jnp.maximum(max_width, 0)[:, None] + 1)
    span = jnp.maximum(valid_len[:, None] - w, 1)
    s = (jax.random.uniform(k_s, (b, n_masks)) * span).astype(jnp.int32)
    idx = jnp.arange(axis_len)[None, None, :]                # [1, 1, T]
    band = (idx >= s[:, :, None]) & (idx < (s + w)[:, :, None])
    return jnp.any(band, axis=1)                             # [B, T]


@functools.partial(jax.jit, static_argnames=("freq_masks", "freq_width",
                                             "time_masks", "time_width",
                                             "mask_value"))
def spec_augment(key, feats: jnp.ndarray, feat_len: jnp.ndarray, *,
                 freq_masks: int = 2, freq_width: int = 27,
                 time_masks: int = 10, time_width: float = 0.05,
                 mask_value: float = 0.0) -> jnp.ndarray:
    """feats [B, T, F], feat_len [B] -> masked copy (training-time only)."""
    b, t, f = feats.shape
    k_f, k_t = jax.random.split(jnp.asarray(key))
    feat_len = feat_len.astype(jnp.int32)
    fmask = _band_mask(k_f, freq_masks, f,
                       jnp.full((b,), freq_width, jnp.int32),
                       jnp.full((b,), f, jnp.int32))         # [B, F]
    if time_width < 1.0:
        max_w = (feat_len.astype(jnp.float32) * time_width).astype(jnp.int32)
    else:
        max_w = jnp.full((b,), int(time_width), jnp.int32)
    tmask = _band_mask(k_t, time_masks, t, max_w, feat_len)  # [B, T]
    # never mask padding (it is already zero and excluded by lengths, but
    # keep the invariant explicit for tests)
    tmask = tmask & (jnp.arange(t)[None, :] < feat_len[:, None])
    masked = jnp.where(tmask[:, :, None], mask_value, feats)
    masked = jnp.where(fmask[:, None, :], mask_value, masked)
    return masked
