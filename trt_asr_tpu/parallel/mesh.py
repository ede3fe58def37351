"""Device mesh + sharding rules.

The reference has NO distributed execution (SURVEY §2.5: single GPU, one
CUDA stream per session). This module is the TPU-native scaling layer it
lacked, following the sharding recipe: pick a mesh, annotate array
shardings, let XLA's GSPMD insert the collectives over ICI.

Mesh axes:
- ``dp``  — data parallel: batch of streams (serving) or examples
  (training). Forward inference needs NO cross-chip collectives on this
  axis; gradients all-reduce over it automatically.
- ``tp``  — tensor parallel: attention heads / FFN hidden of the encoder,
  predictor/joint hidden. At 0.6B this is optional (fits one chip —
  SURVEY §2.5 table) but exercised by the multi-chip dry run; XLA inserts
  the per-layer psums.

PP/EP: not applicable to this model family (24-layer dense encoder fits a
single chip; no MoE) — documented non-goals per SURVEY §2.5. SP/CP: long
audio scales via bounded-cache streaming, not sequence sharding (the
contract's stateful_cache mode); the stacked [L, ...] layer axis is
nonetheless a natural PP axis if ever needed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _tp_spec_for(path: str, ndim: int) -> P:
    """Partition spec for one stacked-layer parameter. Layer-stacked arrays
    lead with [L]; we shard the matmul contraction-free axis over tp."""
    # encoder stacked layers [L, ...]
    if path.endswith(("att_wq", "att_wk", "att_wv", "att_wpos")):
        return P(None, None, "tp")      # [L, D, D] -> heads/columns sharded
    if path.endswith("att_wo"):
        return P(None, "tp", None)      # [L, D, D] -> rows sharded (psum after)
    if path.endswith(("att_bias_u", "att_bias_v")):
        return P(None, "tp", None)      # [L, H, dh]
    if path.endswith(("ff1_w1", "ff2_w1")):
        return P(None, None, "tp")      # [L, D, E]
    if path.endswith(("ff1_w2", "ff2_w2")):
        return P(None, "tp", None)      # [L, E, D]
    if path.endswith("conv_pw1"):
        return P(None, None, "tp")      # [L, D, 2D]
    if path.endswith("conv_pw2"):
        return P(None, "tp", None)
    # predictor / joint
    if path.endswith(("lstm/wi", "lstm/wh")) or "/lstm/" in path and path.endswith(("wi", "wh")):
        return P(None, "tp")            # [P, 4P] column sharded
    if path.endswith(("joint/enc/w", "joint/pred/w")):
        return P(None, "tp")
    if path.endswith("joint/out/w"):
        return P("tp", None)
    if path.endswith("pre_encode/out/w"):
        return P(None, "tp") if ndim == 2 else P()
    return P()  # replicate everything else (norms, biases, convs, embed)


def param_shardings(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """NamedSharding pytree matching the parameter pytree."""

    def walk(path, node):
        if isinstance(node, dict):
            return {k: walk(f"{path}/{k}" if path else k, v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [walk(f"{path}/{i}", v) for i, v in enumerate(node)]
        spec = _tp_spec_for(path, np.ndim(node))
        # drop specs that don't divide evenly (tiny test configs)
        sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        fixed = []
        for dim, ax in enumerate(spec):
            if ax is not None and node.shape[dim] % sizes[ax] != 0:
                fixed.append(None)
            else:
                fixed.append(ax)
        return NamedSharding(mesh, P(*fixed))

    return walk("", params)


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    sh = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, sh)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading batch axis over dp; replicate the rest."""
    return NamedSharding(mesh, P(*(["dp"] + [None] * (ndim - 1))))


def shard_batch(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree)


def encoder_state_shardings(mesh: Mesh):
    """EncoderState arrays are [L, B, ...] (batch axis 1); cache_len [B]."""
    from trt_asr_tpu.models.parakeet.encoder import EncoderState

    ns = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
    return EncoderState(
        att_cache=ns(None, "dp", None, None),
        time_cache=ns(None, "dp", None, None),
        kv_cache=ns(None, "dp", None, None),
        cache_len=ns("dp"),
        cursor=ns("dp"),
    )


def decode_state_shardings(mesh: Mesh):
    """DecodeState: g [B, P]; h/c [R, B, P]; y_id/time_carry [B]."""
    from trt_asr_tpu.decode.tdt_greedy import DecodeState

    ns = lambda *spec: NamedSharding(mesh, P(*spec))  # noqa: E731
    return DecodeState(
        g=ns("dp", None), h=ns(None, "dp", None), c=ns(None, "dp", None),
        y_id=ns("dp"), time_carry=ns("dp"),
    )
