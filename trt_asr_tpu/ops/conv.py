"""Convolution primitives: depthwise 1-D (conformer conv module) and the
dw_striding 2-D subsampling stack.

Layouts are TPU-friendly channels-last (NWC / NHWC); weights stored in
matmul-natural shapes so XLA maps the pointwise convs straight onto the MXU.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
    if groups > 1 and w.shape[2] == 1 and w.shape[3] == groups:
        # Fully-depthwise case: explicit tap-sum instead of
        # feature_group_count. XLA's SPMD partitioner double-counts the
        # grouped-conv weight gradient when an unrelated mesh axis (tp)
        # exists (grad norm scales by the tp size — caught by
        # tests/test_sharded_inference.py); tap-sum is elementwise
        # multiply-accumulate, which partitions correctly and fuses.
        return _depthwise_conv2d_taps(x, w, bias, stride, padding)
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


def _depthwise_conv2d_taps(x: jnp.ndarray, w: jnp.ndarray, bias,
                           stride: Tuple[int, int], padding) -> jnp.ndarray:
    """Depthwise conv2d as sum over kernel taps of strided slices.

    x [B, H, W, C], w [kh, kw, 1, C]; explicit padding [(ph0,ph1),(pw0,pw1)]
    or 'SAME'. Accumulates in f32.
    """
    kh, kw, _, c = w.shape
    sh, sw = stride
    b, h_in, w_in, _ = x.shape
    if padding == "SAME":
        out_h = -(-h_in // sh)
        out_w = -(-w_in // sw)
        pad_h = max((out_h - 1) * sh + kh - h_in, 0)
        pad_w = max((out_w - 1) * sw + kw - w_in, 0)
        padding = [(pad_h // 2, pad_h - pad_h // 2), (pad_w // 2, pad_w - pad_w // 2)]
    (ph0, ph1), (pw0, pw1) = padding
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho = (h_in + ph0 + ph1 - kh) // sh + 1
    wo = (w_in + pw0 + pw1 - kw) // sw + 1
    wf = w.astype(jnp.float32)
    acc = jnp.zeros((b, ho, wo, c), jnp.float32)
    for di in range(kh):
        for dj in range(kw):
            patch = lax.slice(
                xp, (0, di, dj, 0),
                (b, di + (ho - 1) * sh + 1, dj + (wo - 1) * sw + 1, c),
                (1, sh, sw, 1))
            acc = acc + patch.astype(jnp.float32) * wf[di, dj, 0]
    out = acc.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def subsampled_length(length: jnp.ndarray, stages: int) -> jnp.ndarray:
    """Length transform of the dw_striding stack: per stage k=3, s=2, pad=1
    => floor((n - 1)/2) + 1, applied `stages` times."""
    for _ in range(stages):
        length = (length - 1) // 2 + 1
    return length


def dw_striding_subsample(params: Dict, x: jnp.ndarray,
                          lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fast Conformer dw_striding pre-encode.

    x [B, T, F] -> [B, T/8, d_model]. Structure (torch-parity, NeMo
    ConvSubsampling('dw_striding'), contract encoder.subsampling):
    Conv2d(1->C, 3x3, s2, p1) + ReLU, then (stride_stages-1) x
    [depthwise Conv2d(C, 3x3, s2, p1, groups=C); pointwise Conv2d(C->C, 1x1);
    ReLU], then Linear(C * ceil(F/8) -> d_model).

    ``lengths`` [B] (optional): zero the padded tail before stage 1 and
    after every stage. Without this, right-padding is NOT inert: zero
    input rows come out of a stage as ReLU(bias) != 0, and the next
    stride-2 window at the valid boundary reads them — so a padded batch
    row would differ from the same utterance at exact length. With it,
    each stage sees exactly the zeros an exact-length run's own conv
    padding provides, making batched rows bit-consistent with
    per-utterance runs (transcribe_batch's invariant).
    """
    b, t, f = x.shape
    if lengths is not None:
        x = jnp.where(jnp.arange(t)[None, :, None] < lengths[:, None, None],
                      x, 0)
    h = x[..., None]                                  # [B, T, F, 1]
    h = conv2d(h, params["conv_in"]["w"], params["conv_in"].get("b"),
               stride=(2, 2), padding=[(1, 1), (1, 1)])
    h = jnp.maximum(h, 0)
    if lengths is not None:
        lengths = (lengths - 1) // 2 + 1
        h = jnp.where(jnp.arange(h.shape[1])[None, :, None, None]
                      < lengths[:, None, None, None], h, 0)
    for st in params["stages"]:
        c = st["dw_w"].shape[-1]
        h = conv2d(h, st["dw_w"], st.get("dw_b"), stride=(2, 2),
                   padding=[(1, 1), (1, 1)], groups=c)
        h = conv2d(h, st["pw_w"], st.get("pw_b"), stride=(1, 1), padding="VALID")
        h = jnp.maximum(h, 0)
        if lengths is not None:
            lengths = (lengths - 1) // 2 + 1
            h = jnp.where(jnp.arange(h.shape[1])[None, :, None, None]
                          < lengths[:, None, None, None], h, 0)
    bsz, t_out, f_out, c_out = h.shape
    # torch flattening order: transpose to [B, T, C, F] then flatten (C, F)
    h = jnp.transpose(h, (0, 1, 3, 2)).reshape(bsz, t_out, c_out * f_out)
    from trt_asr_tpu.ops.common import matmul
    out = matmul(h, params["out"]["w"])
    if "b" in params["out"] and params["out"]["b"] is not None:
        out = out + params["out"]["b"].astype(out.dtype)
    return out
