"""Scoped int8 weight-only quantization of the Parakeet parameter tree.

The TPU-native analog of the reference's TRT builder-precision selection
(fp16/int8 engine builds, /root/reference/tools/build_trt): instead of
rebuilding an engine, swap weight leaves for ``QuantTensor``s (ops/quant.py)
— every matmul site dispatches on the leaf type, so the same jitted
programs serve f32, bf16, and int8 weights.

Scopes (RuntimeConfig.quant / TRT_ASR_QUANT):
- "joint":   joint enc/pred/out projections — the decode loop's weight
             traffic, dominated by the 640x8198 out matmul.
- "encoder": the ten large per-layer linears (FFN pairs, QKVO, conv
             pointwise). LN/BN/bias/depthwise/pos tables stay float: they
             are bandwidth-trivial and precision-critical.
- "all":     both.

The predictor LSTM and pre-encode convs are intentionally not quantized:
together they are <6% of weight bytes, and the LSTM's recurrence makes it
the most quantization-sensitive component.
"""

from __future__ import annotations

from typing import Any, Dict

from trt_asr_tpu.ops.quant import QuantTensor, dequantize, quantize_tensor

_ENC_LINEARS = ("ff1_w1", "ff1_w2", "ff2_w1", "ff2_w2",
                "att_wq", "att_wk", "att_wv", "att_wo",
                "conv_pw1", "conv_pw2")

SCOPES = ("none", "joint", "encoder", "all")


def quantize_params(params: Dict[str, Any], scope: str = "all") -> Dict[str, Any]:
    """Return a new tree with the scoped weight leaves int8-quantized.
    Shares unmodified leaves with the input tree."""
    assert scope in SCOPES, scope
    if scope == "none":
        return params
    p = dict(params)
    if scope in ("joint", "all"):
        p["joint"] = {
            k: {**params["joint"][k], "w": quantize_tensor(params["joint"][k]["w"])}
            for k in ("enc", "pred", "out")
        }
    if scope in ("encoder", "all"):
        layers = dict(params["encoder"]["layers"])
        for k in _ENC_LINEARS:
            layers[k] = quantize_tensor(layers[k])
        p["encoder"] = {**params["encoder"], "layers": layers}
    return p


def is_quantized(params: Dict[str, Any], which: str = "encoder") -> bool:
    if which == "encoder":
        return isinstance(params["encoder"]["layers"]["att_wq"], QuantTensor)
    return isinstance(params["joint"]["out"]["w"], QuantTensor)


def dequantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse transform (to the quantized values, not the originals)."""
    import jax

    return jax.tree.map(
        lambda x: dequantize(x) if isinstance(x, QuantTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QuantTensor))
