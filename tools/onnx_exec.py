#!/usr/bin/env python3
"""Pure-numpy ONNX graph interpreter.

An op-level-INDEPENDENT third executor of the exported component graphs
(not the torch oracle, not JAX): it knows nothing about this repo's model
code — it topologically walks NodeProtos and evaluates each op from the
public ONNX operator semantics. This is the role the reference's ORT smoke
test played for its export (tools/export_onnx/export.py:819-852; parity
harnesses then executed the graphs, tools/onnxruntime/
onnx_streaming_parity.py:178-230): proof that the .onnx files are runnable
programs outside the producing framework, and an escape from the
same-author-oracle risk.

Supported op set = exactly what trt_asr_tpu/io/onnx_graphs.py emits:
MatMul, Add, Sub, Mul, Div, Relu, Sigmoid, Softmax, Transpose, Gather,
Split, Concat, Unsqueeze, Squeeze, Slice, Reshape, Pad, Identity,
Where, Less, GreaterOrEqual, Clip, Expand, GatherElements,
Conv (1D/2D, strides/pads/group incl. depthwise), BatchNormalization,
LayerNormalization, LSTM (forward, default activations, iofc gate order
per the ONNX spec).

CLI: run a graph on NPZ feeds and write NPZ outputs:
    python tools/onnx_exec.py model.onnx --feeds feeds.npz --out outs.npz
"""
from __future__ import annotations

import sys
from typing import Dict, List

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.io.onnx_lite import OnnxModel, OnnxNode, read_onnx  # noqa: E402


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _lstm(node: OnnxNode, vals: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """ONNX LSTM, forward direction, default activations (f=Sigmoid,
    g=Tanh, h=Tanh), gate blocks ordered i, o, f, c along the 4H axis.
    X [S,B,In], W [1,4H,In], R [1,4H,H], B [1,8H], initial_h/c [1,B,H].
    Returns Y [S,1,B,H], Y_h [1,B,H], Y_c [1,B,H]."""
    x = vals[node.inputs[0]]
    w = vals[node.inputs[1]][0]           # [4H, In]
    r = vals[node.inputs[2]][0]           # [4H, H]
    hidden = int(node.attrs["hidden_size"])
    b = vals[node.inputs[3]][0] if len(node.inputs) > 3 and node.inputs[3] \
        else np.zeros(8 * hidden, x.dtype)
    h = vals[node.inputs[5]][0].copy() if len(node.inputs) > 5 and node.inputs[5] \
        else np.zeros((x.shape[1], hidden), x.dtype)
    c = vals[node.inputs[6]][0].copy() if len(node.inputs) > 6 and node.inputs[6] \
        else np.zeros((x.shape[1], hidden), x.dtype)
    wb, rb = b[: 4 * hidden], b[4 * hidden:]
    ys = []
    for t in range(x.shape[0]):
        gates = x[t] @ w.T + h @ r.T + wb + rb          # [B, 4H], i|o|f|c
        i = _sigmoid(gates[:, 0 * hidden: 1 * hidden])
        o = _sigmoid(gates[:, 1 * hidden: 2 * hidden])
        f = _sigmoid(gates[:, 2 * hidden: 3 * hidden])
        g = np.tanh(gates[:, 3 * hidden: 4 * hidden])
        c = f * c + i * g
        h = o * np.tanh(c)
        ys.append(h)
    y = np.stack(ys)[:, None]                            # [S,1,B,H]
    return [y, h[None], c[None]]


def _conv(node: OnnxNode, ins: List[np.ndarray]) -> np.ndarray:
    """ONNX Conv (cross-correlation), 1D/2D, strides/pads/group.
    X [N,C,*S], W [M,C/g,*K], optional bias [M]."""
    from numpy.lib.stride_tricks import sliding_window_view

    x, w = ins[0], ins[1]
    b = ins[2] if len(ins) > 2 and ins[2] is not None else None
    group = int(node.attrs.get("group", 1))
    sp = x.ndim - 2
    strides = [int(s) for s in node.attrs.get("strides", [1] * sp)]
    pads = [int(p) for p in node.attrs.get("pads", [0] * (2 * sp))]
    xp = np.pad(x, [(0, 0), (0, 0)] + [(pads[i], pads[i + sp]) for i in range(sp)])
    ksp = tuple(w.shape[2:])
    win = sliding_window_view(xp, ksp, axis=tuple(range(2, 2 + sp)))
    win = win[(slice(None), slice(None))
              + tuple(slice(None, None, s) for s in strides)]
    c, m = x.shape[1], w.shape[0]
    if group == c and m == c and w.shape[1] == 1:
        # depthwise fast path: win [N,C,*O,*K] * w [C,1,*K]
        wk = w[:, 0].reshape((1, c) + (1,) * sp + ksp)
        y = (win * wk).sum(axis=tuple(range(2 + sp, 2 + 2 * sp)))
    else:
        cg, mg = c // group, m // group
        parts = []
        ax_x = [1] + list(range(2 + sp, 2 + 2 * sp))
        ax_w = [1] + list(range(2, 2 + sp))
        for g in range(group):
            out = np.tensordot(win[:, g * cg:(g + 1) * cg],
                               w[g * mg:(g + 1) * mg], axes=(ax_x, ax_w))
            parts.append(np.moveaxis(out, -1, 1))  # [N, mg, *O]
        y = np.concatenate(parts, axis=1) if group > 1 else parts[0]
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * sp)
    return y.astype(x.dtype)


def _eval_node(node: OnnxNode, vals: Dict[str, np.ndarray]) -> List[np.ndarray]:
    op, ins = node.op_type, [vals[i] if i else None for i in node.inputs]
    if op == "MatMul":
        return [ins[0] @ ins[1]]
    if op == "Add":
        return [ins[0] + ins[1]]
    if op == "Relu":
        return [np.maximum(ins[0], 0)]
    if op == "Transpose":
        perm = node.attrs.get("perm")
        return [np.transpose(ins[0], perm and [int(p) for p in perm])]
    if op == "Gather":
        return [np.take(ins[0], ins[1], axis=int(node.attrs.get("axis", 0)))]
    if op == "Split":
        axis = int(node.attrs.get("axis", 0))
        if len(ins) > 1 and ins[1] is not None:
            sizes = np.cumsum(ins[1])[:-1]
            return list(np.split(ins[0], sizes, axis=axis))
        n = int(node.attrs.get("num_outputs", len(node.outputs)))
        return list(np.split(ins[0], n, axis=axis))
    if op == "Concat":
        return [np.concatenate(ins, axis=int(node.attrs["axis"]))]
    if op == "Unsqueeze":
        out = ins[0]
        for ax in sorted(int(a) for a in np.asarray(ins[1]).ravel()):
            out = np.expand_dims(out, ax)
        return [out]
    if op == "Squeeze":
        axes = tuple(int(a) for a in np.asarray(ins[1]).ravel())
        return [np.squeeze(ins[0], axis=axes)]
    if op == "Slice":
        data, starts, ends = ins[0], np.asarray(ins[1]), np.asarray(ins[2])
        axes = (np.asarray(ins[3]).ravel() if len(ins) > 3 and ins[3] is not None
                else np.arange(len(starts)))
        steps = (np.asarray(ins[4]).ravel() if len(ins) > 4 and ins[4] is not None
                 else np.ones(len(starts), np.int64))
        sl = [slice(None)] * data.ndim
        for s, e, a, st in zip(starts.ravel(), ends.ravel(), axes, steps):
            sl[int(a)] = slice(int(s), int(e), int(st))
        return [data[tuple(sl)]]
    if op == "LSTM":
        return _lstm(node, vals)
    if op == "Mul":
        return [ins[0] * ins[1]]
    if op == "Sub":
        return [ins[0] - ins[1]]
    if op == "Div":
        a, b2 = ins[0], ins[1]
        if np.issubdtype(np.asarray(a).dtype, np.integer):
            # ONNX integer Div truncates toward zero (C semantics), NOT
            # numpy's floor division — they differ on negative quotients
            q = np.trunc(np.asarray(a, np.float64) / np.asarray(b2, np.float64))
            return [q.astype(np.asarray(a).dtype)]
        return [a / b2]
    if op == "Sigmoid":
        return [_sigmoid(ins[0])]
    if op == "Identity":
        return [ins[0]]
    if op == "Softmax":
        ax = int(node.attrs.get("axis", -1))
        z = ins[0] - np.max(ins[0], axis=ax, keepdims=True)
        e = np.exp(z)
        return [e / np.sum(e, axis=ax, keepdims=True)]
    if op == "Reshape":
        return [np.reshape(ins[0], [int(v) for v in np.asarray(ins[1]).ravel()])]
    if op == "Pad":
        pads = np.asarray(ins[1]).ravel()
        nd = ins[0].ndim
        width = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
        cval = float(np.asarray(ins[2]).ravel()[0]) if len(ins) > 2 and ins[2] is not None else 0.0
        return [np.pad(ins[0], width, constant_values=cval)]
    if op == "LayerNormalization":
        eps = float(node.attrs.get("epsilon", 1e-5))
        ax = int(node.attrs.get("axis", -1))
        x = ins[0].astype(np.float64)
        mean = x.mean(axis=ax, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=ax, keepdims=True)
        y = (x - mean) / np.sqrt(var + eps)
        return [(y * ins[1] + ins[2]).astype(ins[0].dtype)]
    if op == "BatchNormalization":
        eps = float(node.attrs.get("epsilon", 1e-5))
        x, g, b2, m, v = ins[:5]
        shape = [1, -1] + [1] * (x.ndim - 2)   # stats broadcast over C axis
        scale = (g / np.sqrt(v + eps)).reshape(shape)
        return [x * scale + (b2 - m * g / np.sqrt(v + eps)).reshape(shape)]
    if op == "Conv":
        return [_conv(node, ins)]
    if op == "Where":
        return [np.where(ins[0], ins[1], ins[2])]
    if op == "Less":
        return [np.less(ins[0], ins[1])]
    if op == "GreaterOrEqual":
        return [np.greater_equal(ins[0], ins[1])]
    if op == "Clip":
        lo = ins[1] if len(ins) > 1 and ins[1] is not None else None
        hi = ins[2] if len(ins) > 2 and ins[2] is not None else None
        return [np.clip(ins[0], lo, hi)]
    if op == "Expand":
        shape = [int(v) for v in np.asarray(ins[1]).ravel()]
        return [np.broadcast_to(ins[0], shape)]
    if op == "GatherElements":
        ax = int(node.attrs.get("axis", 0))
        return [np.take_along_axis(ins[0], np.asarray(ins[1], np.int64), axis=ax)]
    raise NotImplementedError(f"op {op}")


def run_graph(model: OnnxModel, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute the graph on the given input feeds; returns the graph
    outputs by name. Nodes are evaluated in topological order (the emitted
    graphs are already topologically sorted; we verify as we go)."""
    vals: Dict[str, np.ndarray] = {
        name: t.array for name, t in model.initializers.items()
        if t.array is not None}
    vals.update({k: np.asarray(v) for k, v in feeds.items()})
    pending = list(model.nodes)
    progress = True
    while pending and progress:
        progress = False
        remaining = []
        for node in pending:
            if all((not i) or i in vals for i in node.inputs):
                outs = _eval_node(node, vals)
                for name, arr in zip(node.outputs, outs):
                    vals[name] = arr
                progress = True
            else:
                remaining.append(node)
        pending = remaining
    if pending:
        missing = {i for n in pending for i in n.inputs if i and i not in vals}
        raise RuntimeError(f"graph not executable; unresolved inputs: {sorted(missing)[:8]}")
    absent = [o for o in model.outputs if o not in vals]
    if absent:
        raise RuntimeError(f"graph produced no value for outputs {absent}")
    return {o: vals[o] for o in model.outputs}


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("--feeds", required=True, help="NPZ of graph inputs")
    ap.add_argument("--out", default="", help="NPZ path for graph outputs")
    args = ap.parse_args()

    model = read_onnx(args.model)
    if not model.nodes:
        print(f"{args.model}: no compute nodes — initializer-only file", file=sys.stderr)
        return 2
    feeds = dict(np.load(args.feeds))
    outs = run_graph(model, feeds)
    for k, v in outs.items():
        print(f"{k}: shape {v.shape} dtype {v.dtype} "
              f"mean {float(np.mean(v)):.6g}")
    if args.out:
        np.savez(args.out, **outs)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
