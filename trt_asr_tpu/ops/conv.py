"""Convolution primitives: depthwise 1-D (conformer conv module) and the
dw_striding 2-D subsampling stack.

Layouts are TPU-friendly channels-last (NWC / NHWC); weights stored in
matmul-natural shapes so XLA maps the pointwise convs straight onto the MXU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from jax import lax


def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, bias=None) -> jnp.ndarray:
    """x [B, T, D], w [K, D] -> VALID depthwise conv, [B, T-K+1, D]."""
    k, d = w.shape
    out = lax.conv_general_dilated(
        x, w.reshape(k, 1, d).astype(x.dtype),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=d,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv2d(x: jnp.ndarray, w: jnp.ndarray, bias=None, stride: Tuple[int, int] = (1, 1),
           padding="SAME", groups: int = 1) -> jnp.ndarray:
    """x [B, H, W, Cin], w [kh, kw, Cin/groups, Cout]."""
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def subsampled_length(length: jnp.ndarray, stages: int) -> jnp.ndarray:
    """Length transform of the dw_striding stack: per stage k=3, s=2, pad=1
    => floor((n - 1)/2) + 1, applied `stages` times."""
    for _ in range(stages):
        length = (length - 1) // 2 + 1
    return length


def dw_striding_subsample(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Fast Conformer dw_striding pre-encode.

    x [B, T, F] -> [B, T/8, d_model]. Structure (torch-parity, NeMo
    ConvSubsampling('dw_striding'), contract encoder.subsampling):
    Conv2d(1->C, 3x3, s2, p1) + ReLU, then (stride_stages-1) x
    [depthwise Conv2d(C, 3x3, s2, p1, groups=C); pointwise Conv2d(C->C, 1x1);
    ReLU], then Linear(C * ceil(F/8) -> d_model).
    """
    b, t, f = x.shape
    h = x[..., None]                                  # [B, T, F, 1]
    h = conv2d(h, params["conv_in"]["w"], params["conv_in"].get("b"),
               stride=(2, 2), padding=[(1, 1), (1, 1)])
    h = jnp.maximum(h, 0)
    for st in params["stages"]:
        c = st["dw_w"].shape[-1]
        h = conv2d(h, st["dw_w"], st.get("dw_b"), stride=(2, 2),
                   padding=[(1, 1), (1, 1)], groups=c)
        h = conv2d(h, st["pw_w"], st.get("pw_b"), stride=(1, 1), padding="VALID")
        h = jnp.maximum(h, 0)
    bsz, t_out, f_out, c_out = h.shape
    # torch flattening order: transpose to [B, T, C, F] then flatten (C, F)
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(bsz, t_out, c_out * f_out)
    from trt_asr_tpu.ops.common import matmul
    out = matmul(h, params["out"]["w"])
    if "b" in params["out"] and params["out"]["b"] is not None:
        out = out + params["out"]["b"].astype(out.dtype)
    return out
