"""Per-feature (per-mel-bin) utterance normalization.

Matches the reference numerics exactly (rust/features/src/lib.rs:127-172):
mean over frames; std with an N-1 denominator (N=1 -> denominator 1) plus
epsilon 1e-5 added to the std (not the variance). Stats are computed over the
FULL utterance and then applied per chunk — the contract marks this mode as
not streaming-safe (normalize_requires_full_utterance).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


def compute_per_feature_stats(features_tc: Array, eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """features [T, C] (or [B, T, C]) -> (mean [C], std [C]) over time."""
    x = jnp.asarray(features_tc, dtype=jnp.float32)
    frames = x.shape[-2]
    mean = jnp.mean(x, axis=-2)
    denom = float(frames - 1) if frames > 1 else 1.0
    var = jnp.sum((x - mean[..., None, :]) ** 2, axis=-2) / denom
    std = jnp.sqrt(var) + eps
    return mean, std


def apply_per_feature_norm(features_tc: Array, mean: Array, std: Array) -> jnp.ndarray:
    x = jnp.asarray(features_tc, dtype=jnp.float32)
    return (x - jnp.asarray(mean)[..., None, :]) / jnp.asarray(std)[..., None, :]
