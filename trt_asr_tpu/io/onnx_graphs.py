"""Executable ONNX compute graphs for the predictor and joint components.

The reference's export produced *runnable* ONNX programs smoke-tested under
ORT (tools/export_onnx/export.py:819-852); its parity harnesses then
executed them as an op-level-independent oracle. This module restores that
property for our export: predictor.onnx and joint.onnx carry real compute
nodes (Gather/LSTM/MatMul/Add/Relu/Transpose/...) over the SAME
NeMo-state-dict-named, torch-layout initializers the weight loader
consumes — layout adaptation (weight transposes, torch ifgo -> ONNX iofc
LSTM gate reorder) happens *inside the graph* via Transpose/Split/Concat
nodes, so the stored weights stay byte-identical to the initializer-only
export and real-NeMo artifacts remain loadable.

Graph IO contracts (reference model_meta.json tensor_layout_contract,
export.py:970-997):
  predictor: y [B,U] int32, h/c [L,B,H] -> g [B,H,U], h_out/c_out [L,B,H]
  joint: encoder_output [B,D,T], predictor_output [B,H,U]
         -> joint_output [B,T,U,V]

A pure-numpy interpreter for exactly this op set lives in
tools/onnx_exec.py; tests/test_onnx_weights.py::test_onnx_graph_exec_parity
asserts logits parity vs the JAX implementation at 1e-5.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.io.onnx_lite import OnnxNode

# ONNX TensorProto elem types used in IO value infos
F32, I32, I64 = 1, 6, 7


def _n(op: str, ins: List[str], outs: List[str], **attrs) -> OnnxNode:
    return OnnxNode(op, list(ins), list(outs), name=outs[0], attrs=dict(attrs))


def _ifgo_to_iofc(prefix: str, src: str, nodes: List[OnnxNode],
                  consts: Dict[str, np.ndarray]) -> str:
    """Reorder a torch LSTM parameter (gate blocks i,f,g,o along axis 0)
    into ONNX LSTM order (i,o,f,c where ONNX's c IS torch's g), then add
    the leading num_directions axis. Runs as graph nodes so the stored
    initializer keeps the torch layout."""
    parts = [f"{prefix}_g{i}" for i in range(4)]
    nodes.append(_n("Split", [src], parts, axis=0, num_outputs=4))
    cat = f"{prefix}_iofc"
    i, f, g, o = parts
    nodes.append(_n("Concat", [i, o, f, g], [cat], axis=0))
    consts.setdefault("__axes0", np.array([0], np.int64))
    out = f"{prefix}_dir"
    nodes.append(_n("Unsqueeze", [cat, "__axes0"], [out]))
    return out


def predictor_graph(cfg: ModelConfig) -> Tuple[List[OnnxNode],
                                               Dict[str, np.ndarray],
                                               Dict[str, Tuple[int, Tuple]]]:
    """Compute nodes for predictor.onnx: embedding gather + L ONNX LSTM
    layers + the reference's [B,U,H]->[B,H,U] output transpose."""
    nodes: List[OnnxNode] = []
    consts: Dict[str, np.ndarray] = {}
    H = cfg.pred_hidden
    L = cfg.pred_rnn_layers

    nodes.append(_n("Gather", ["prediction.embed.weight", "y"], ["emb"], axis=0))
    nodes.append(_n("Transpose", ["emb"], ["x0"], perm=[1, 0, 2]))  # [U,B,E]

    h_outs, c_outs = [], []
    x = "x0"
    for li in range(L):
        w = _ifgo_to_iofc(f"W{li}", f"prediction.dec_rnn.lstm.weight_ih_l{li}",
                          nodes, consts)
        r = _ifgo_to_iofc(f"R{li}", f"prediction.dec_rnn.lstm.weight_hh_l{li}",
                          nodes, consts)
        bi = _ifgo_to_iofc(f"Bi{li}", f"prediction.dec_rnn.lstm.bias_ih_l{li}",
                           nodes, consts)
        bh = _ifgo_to_iofc(f"Bh{li}", f"prediction.dec_rnn.lstm.bias_hh_l{li}",
                           nodes, consts)
        b = f"B{li}_onnx"
        nodes.append(_n("Concat", [bi, bh], [b], axis=1))  # [1, 8H]
        consts[f"__sl_start{li}"] = np.array([li], np.int64)
        consts[f"__sl_end{li}"] = np.array([li + 1], np.int64)
        consts.setdefault("__sl_axis0", np.array([0], np.int64))
        h0, c0 = f"h0_{li}", f"c0_{li}"
        nodes.append(_n("Slice", ["h", f"__sl_start{li}", f"__sl_end{li}",
                                  "__sl_axis0"], [h0]))
        nodes.append(_n("Slice", ["c", f"__sl_start{li}", f"__sl_end{li}",
                                  "__sl_axis0"], [c0]))
        y_all, y_h, y_c = f"Y{li}", f"Yh{li}", f"Yc{li}"
        nodes.append(_n("LSTM", [x, w, r, b, "", h0, c0], [y_all, y_h, y_c],
                        hidden_size=H))
        consts.setdefault("__axes1", np.array([1], np.int64))
        nxt = f"x{li + 1}"
        nodes.append(_n("Squeeze", [y_all, "__axes1"], [nxt]))  # [U,B,H]
        x = nxt
        h_outs.append(y_h)
        c_outs.append(y_c)

    nodes.append(_n("Concat", h_outs, ["h_out"], axis=0))
    nodes.append(_n("Concat", c_outs, ["c_out"], axis=0))
    # reference g layout is [B, H, U] (model_meta tensor_layout_contract)
    nodes.append(_n("Transpose", [x], ["g"], perm=[1, 2, 0]))

    io_types = {
        "y": (I32, ("B", "U")),
        "h": (F32, (L, "B", H)),
        "c": (F32, (L, "B", H)),
        "g": (F32, ("B", H, "U")),
        "h_out": (F32, (L, "B", H)),
        "c_out": (F32, (L, "B", H)),
    }
    return nodes, consts, io_types


def joint_graph(cfg: ModelConfig) -> Tuple[List[OnnxNode],
                                           Dict[str, np.ndarray],
                                           Dict[str, Tuple[int, Tuple]]]:
    """Compute nodes for joint.onnx: two input projections, broadcast add,
    ReLU, output projection -> raw logits [B,T,U,V] (no LogSoftmax — the
    reference asserts its absence, tools/inspect_onnx/check_joint_output.py)."""
    nodes: List[OnnxNode] = []
    consts: Dict[str, np.ndarray] = {
        "__axes1": np.array([1], np.int64),
        "__axes2": np.array([2], np.int64),
    }
    nodes.append(_n("Transpose", ["encoder_output"], ["enc_btd"], perm=[0, 2, 1]))
    nodes.append(_n("Transpose", ["joint.enc.weight"], ["Wenc_t"], perm=[1, 0]))
    nodes.append(_n("MatMul", ["enc_btd", "Wenc_t"], ["enc_mm"]))
    nodes.append(_n("Add", ["enc_mm", "joint.enc.bias"], ["enc_proj"]))

    nodes.append(_n("Transpose", ["predictor_output"], ["pred_buh"], perm=[0, 2, 1]))
    nodes.append(_n("Transpose", ["joint.pred.weight"], ["Wpred_t"], perm=[1, 0]))
    nodes.append(_n("MatMul", ["pred_buh", "Wpred_t"], ["pred_mm"]))
    nodes.append(_n("Add", ["pred_mm", "joint.pred.bias"], ["pred_proj"]))

    nodes.append(_n("Unsqueeze", ["enc_proj", "__axes2"], ["enc_btuj"]))   # [B,T,1,J]
    nodes.append(_n("Unsqueeze", ["pred_proj", "__axes1"], ["pred_btuj"]))  # [B,1,U,J]
    nodes.append(_n("Add", ["enc_btuj", "pred_btuj"], ["sum_btuj"]))
    nodes.append(_n("Relu", ["sum_btuj"], ["act"]))
    nodes.append(_n("Transpose", ["joint.joint_net.2.weight"], ["Wout_t"], perm=[1, 0]))
    nodes.append(_n("MatMul", ["act", "Wout_t"], ["out_mm"]))
    nodes.append(_n("Add", ["out_mm", "joint.joint_net.2.bias"], ["joint_output"]))

    io_types = {
        "encoder_output": (F32, ("B", cfg.d_model, "T")),
        "predictor_output": (F32, ("B", cfg.pred_hidden, "U")),
        "joint_output": (F32, ("B", "T", "U", cfg.joint_vocab_size)),
    }
    return nodes, consts, io_types
