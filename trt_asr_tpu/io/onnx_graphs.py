"""Executable ONNX compute graphs for the encoder, predictor and joint.

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


def encoder_graph(cfg: ModelConfig, t_in: int) -> Tuple[List[OnnxNode],
                                                        Dict[str, np.ndarray],
                                                        Dict[str, Tuple[int, Tuple]]]:
    """Compute nodes for encoder.onnx (OFFLINE full-utterance encode) at a
    STATIC input length ``t_in`` — the executable-export analog of the
    reference's fixed TRT shape profiles (its ONNX used dynamic axes; a
    static-shape runnable program serves the same independent-execution
    role and is recorded in model_meta.json as encoder_static_t_in).

    Mirrors models/parakeet/encoder.py offline semantics node for node:
    dw_striding 8x subsample -> per layer [macaron FFN1 (silu, 1/2
    residual) -> rel-pos MHA (Transformer-XL shift via Pad/Reshape/Slice,
    exactly ops/attention.py:93-96) -> conv module (GLU, depthwise k=9
    over a zero-padded window, BatchNorm inference, silu) -> FFN2 ->
    LayerNorm]. Unmasked: the static graph assumes all t_in frames valid
    (feed full windows; `length` only drives encoded_lengths).

    Initializers keep the unprefixed NeMo state-dict names/layouts of the
    weight-interchange export; layout adaptation (torch [out,in] linear
    transposes, pointwise-conv squeeze) happens in-graph, so the stored
    weights stay byte-identical."""
    d = cfg.d_model
    h = cfg.n_heads
    dh = d // h
    f_in = cfg.feat_in

    # static post-subsample geometry (ops/conv.py:subsampled_length)
    t = t_in
    f_sub = f_in
    for _ in range(cfg.stride_stages):
        t = (t - 1) // 2 + 1
        f_sub = (f_sub - 1) // 2 + 1
    r = 2 * t - 1
    k_ctx = cfg.conv_context_size

    nodes: List[OnnxNode] = []
    consts: Dict[str, np.ndarray] = {
        "__axes1": np.array([1], np.int64),
        "__axes2": np.array([2], np.int64),
        "__i_1": np.array([1], np.int64),
        "__i_2": np.array([2], np.int64),
        "__zero": np.array([0], np.int64),
    }

    def n(op, ins, outs, **attrs):
        nodes.append(_n(op, ins, outs, **attrs))
        return outs[0]

    # ---- pre-encode: [1, F, T_in] -> NCHW [1, 1, T_in, F] ----
    x = n("Transpose", ["audio_signal"], ["pe_tf"], perm=[0, 2, 1])
    x = n("Unsqueeze", [x, "__axes1"], ["pe_nchw"])
    x = n("Conv", [x, "pre_encode.conv.0.weight", "pre_encode.conv.0.bias"],
          ["pe_c0"], strides=[2, 2], pads=[1, 1, 1, 1], kernel_shape=[3, 3])
    x = n("Relu", [x], ["pe_r0"])
    ch = cfg.subsampling_conv_channels
    for s in range(cfg.stride_stages - 1):
        base = 2 + 3 * s
        x = n("Conv", [x, f"pre_encode.conv.{base}.weight",
                       f"pre_encode.conv.{base}.bias"], [f"pe_dw{s}"],
              strides=[2, 2], pads=[1, 1, 1, 1], kernel_shape=[3, 3], group=ch)
        x = n("Conv", [x, f"pre_encode.conv.{base + 1}.weight",
                       f"pre_encode.conv.{base + 1}.bias"], [f"pe_pw{s}"],
              strides=[1, 1], pads=[0, 0, 0, 0], kernel_shape=[1, 1])
        x = n("Relu", [x], [f"pe_r{s + 1}"])
    # torch flattening order: [1,C,T,F'] -> [1,T,C,F'] -> [1,T,C*F']
    x = n("Transpose", [x], ["pe_tcf"], perm=[0, 2, 1, 3])
    consts["__pe_flat"] = np.array([1, t, ch * f_sub], np.int64)
    x = n("Reshape", [x, "__pe_flat"], ["pe_flat"])
    w = n("Transpose", ["pre_encode.out.weight"], ["pe_outW_t"], perm=[1, 0])
    x = n("MatMul", [x, w], ["pe_mm"])
    x = n("Add", [x, "pre_encode.out.bias"], ["x_enc0"])

    # shared constants. Pos table built in pure numpy (identical math to
    # ops/attention.py:sinusoidal_pos_table — descending positions, sin
    # even / cos odd) so the exporter never touches a jax device.
    positions = np.arange(t - 1, -t, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64)
                 * -(np.log(10000.0) / d))
    pe = np.zeros((2 * t - 1, d), np.float64)
    pe[:, 0::2] = np.sin(positions * div)
    pe[:, 1::2] = np.cos(positions * div)
    consts["__pos_table"] = pe.astype(np.float32)            # [R, D]
    consts["__att_scale"] = np.float32(1.0 / np.sqrt(dh))
    consts["__half"] = np.float32(0.5)
    consts["__conv_zpad"] = np.zeros((1, k_ctx, d), np.float32)
    consts["__q4"] = np.array([1, t, h, dh], np.int64)
    consts["__flat_d"] = np.array([1, t, d], np.int64)
    consts["__pd_flat"] = np.array([1, h, t * (r + 1)], np.int64)
    consts["__pd_back"] = np.array([1, h, t, r], np.int64)
    consts["__pos_hdr"] = np.array([r, h, dh], np.int64)
    consts["__bias_r"] = np.array([h, 1, dh], np.int64)
    consts["__pad_last1"] = np.array([0, 0, 0, 1, 0, 0, 0, 0], np.int64)
    consts["__imax"] = np.array([np.iinfo(np.int64).max], np.int64)
    consts["__i_t"] = np.array([t], np.int64)
    consts["__axes3"] = np.array([3], np.int64)

    def ln(xi, g, b, out):
        return n("LayerNormalization", [xi, g, b], [out], axis=-1,
                 epsilon=1e-5)

    def silu(xi, tag):
        s = n("Sigmoid", [xi], [f"{tag}_sg"])
        return n("Mul", [xi, s], [f"{tag}_silu"])

    for li in range(cfg.num_layers):
        p = f"layers.{li}"
        lt = f"l{li}"

        def mm_t(src, wname, out):
            wt = n("Transpose", [wname], [f"{out}_Wt"], perm=[1, 0])
            return n("MatMul", [src, wt], [out])

        # ---- macaron FFN1 ----
        def half_ffn(xi, which):
            tag = f"{lt}_{which}"
            u0 = ln(xi, f"{p}.norm_{which}.weight", f"{p}.norm_{which}.bias",
                    f"{tag}_ln")
            m1 = mm_t(u0, f"{p}.{which}.linear1.weight", f"{tag}_m1")
            a = silu(m1, tag)
            m2 = mm_t(a, f"{p}.{which}.linear2.weight", f"{tag}_m2")
            sc = n("Mul", [m2, "__half"], [f"{tag}_half"])
            return n("Add", [xi, sc], [f"{tag}_res"])

        x = half_ffn(x, "feed_forward1")

        # ---- rel-pos self-attention ----
        u = ln(x, f"{p}.norm_self_att.weight", f"{p}.norm_self_att.bias",
               f"{lt}_att_ln")
        q = mm_t(u, f"{p}.self_attn.linear_q.weight", f"{lt}_q")
        kk = mm_t(u, f"{p}.self_attn.linear_k.weight", f"{lt}_k")
        vv = mm_t(u, f"{p}.self_attn.linear_v.weight", f"{lt}_v")
        q4 = n("Reshape", [q, "__q4"], [f"{lt}_q4"])
        q4 = n("Transpose", [q4], [f"{lt}_q4t"], perm=[0, 2, 1, 3])  # [1,H,T,dh]
        k4 = n("Reshape", [kk, "__q4"], [f"{lt}_k4"])
        kT = n("Transpose", [k4], [f"{lt}_kT"], perm=[0, 2, 3, 1])   # [1,H,dh,T]
        v4 = n("Reshape", [vv, "__q4"], [f"{lt}_v4"])
        v4 = n("Transpose", [v4], [f"{lt}_v4t"], perm=[0, 2, 1, 3])  # [1,H,T,dh]
        bu = n("Reshape", [f"{p}.self_attn.pos_bias_u", "__bias_r"],
               [f"{lt}_bu"])
        bv = n("Reshape", [f"{p}.self_attn.pos_bias_v", "__bias_r"],
               [f"{lt}_bv"])
        qu = n("Add", [q4, bu], [f"{lt}_qu"])
        qv = n("Add", [q4, bv], [f"{lt}_qv"])
        # positional projection in-graph: pos_proj = pos_table @ W_pos^T
        pw = n("Transpose", [f"{p}.self_attn.linear_pos.weight"],
               [f"{lt}_posW_t"], perm=[1, 0])
        pp = n("MatMul", ["__pos_table", pw], [f"{lt}_pp"])         # [R, D]
        pp = n("Reshape", [pp, "__pos_hdr"], [f"{lt}_pp3"])          # [R,H,dh]
        ppT = n("Transpose", [pp], [f"{lt}_ppT"], perm=[1, 2, 0])    # [H,dh,R]
        ac = n("MatMul", [qu, kT], [f"{lt}_ac"])                     # [1,H,T,T]
        pd = n("MatMul", [qv, ppT], [f"{lt}_pd"])                    # [1,H,T,R]
        # Transformer-XL relative shift (ops/attention.py:93-96)
        pad = n("Pad", [pd, "__pad_last1"], [f"{lt}_pdp"])           # [1,H,T,R+1]
        fl = n("Reshape", [pad, "__pd_flat"], [f"{lt}_pdf"])
        sl = n("Slice", [fl, "__i_t", "__imax", "__axes2"], [f"{lt}_pds"])
        bk = n("Reshape", [sl, "__pd_back"], [f"{lt}_pdb"])          # [1,H,T,R]
        bd = n("Slice", [bk, "__zero", "__i_t", "__axes3"],
               [f"{lt}_bd"])                                         # [1,H,T,T]
        sc = n("Add", [ac, bd], [f"{lt}_sc"])
        sc = n("Mul", [sc, "__att_scale"], [f"{lt}_scs"])
        at = n("Softmax", [sc], [f"{lt}_sm"], axis=3)
        av = n("MatMul", [at, v4], [f"{lt}_av"])                     # [1,H,T,dh]
        av = n("Transpose", [av], [f"{lt}_avt"], perm=[0, 2, 1, 3])
        av = n("Reshape", [av, "__flat_d"], [f"{lt}_avf"])
        ao = mm_t(av, f"{p}.self_attn.linear_out.weight", f"{lt}_ao")
        x = n("Add", [x, ao], [f"{lt}_att_res"])

        # ---- convolution module ----
        c = ln(x, f"{p}.norm_conv.weight", f"{p}.norm_conv.bias",
               f"{lt}_cv_ln")
        pw1 = n("Squeeze", [f"{p}.conv.pointwise_conv1.weight", "__axes2"],
                [f"{lt}_pw1s"])
        pw1 = n("Transpose", [pw1], [f"{lt}_pw1t"], perm=[1, 0])
        c = n("MatMul", [c, pw1], [f"{lt}_cv_pw1"])                  # [1,T,2D]
        g1, g2 = f"{lt}_glu_a", f"{lt}_glu_b"
        nodes.append(_n("Split", [c], [g1, g2], axis=2, num_outputs=2))
        gs = n("Sigmoid", [g2], [f"{lt}_glu_sg"])
        c = n("Mul", [g1, gs], [f"{lt}_glu"])                        # [1,T,D]
        c = n("Concat", ["__conv_zpad", c, "__conv_zpad"], [f"{lt}_cv_ext"],
              axis=1)                                                # [1,T+2K,D]
        c = n("Transpose", [c], [f"{lt}_cv_ncw"], perm=[0, 2, 1])
        c = n("Conv", [c, f"{p}.conv.depthwise_conv.weight"], [f"{lt}_cv_dw"],
              strides=[1], pads=[0, 0], kernel_shape=[cfg.conv_kernel_size],
              group=d)                                               # [1,D,T]
        c = n("BatchNormalization",
              [c, f"{p}.conv.batch_norm.weight", f"{p}.conv.batch_norm.bias",
               f"{p}.conv.batch_norm.running_mean",
               f"{p}.conv.batch_norm.running_var"], [f"{lt}_cv_bn"],
              epsilon=1e-5)
        c = n("Transpose", [c], [f"{lt}_cv_twd"], perm=[0, 2, 1])    # [1,T,D]
        c = silu(c, f"{lt}_cv")
        pw2 = n("Squeeze", [f"{p}.conv.pointwise_conv2.weight", "__axes2"],
                [f"{lt}_pw2s"])
        pw2 = n("Transpose", [pw2], [f"{lt}_pw2t"], perm=[1, 0])
        c = n("MatMul", [c, pw2], [f"{lt}_cv_pw2"])
        x = n("Add", [x, c], [f"{lt}_cv_res"])

        # ---- FFN2 + out LN ----
        x = half_ffn(x, "feed_forward2")
        x = ln(x, f"{p}.norm_out.weight", f"{p}.norm_out.bias",
               f"{lt}_out_ln")

    # reference layout [B, D, T_enc]
    n("Transpose", [x], ["encoder_output"], perm=[0, 2, 1])
    # encoded_lengths = subsampled_length(length). Each stride-2 stage is
    # ceil(n/2), emitted as (n+1)/2 — for n >= 0 this is identical under
    # floor AND truncate-toward-zero division (ONNX Div is trunc), unlike
    # floor((n-1)/2)+1 which diverges at n == 0 between the two semantics.
    ll = "length"
    for st in range(cfg.stride_stages):
        a = n("Add", [ll, "__i_1"], [f"len_a{st}"])
        ll = n("Div", [a, "__i_2"], [f"len_d{st}"])
    n("Identity", [ll], ["encoded_lengths"])

    io_types = {
        "audio_signal": (F32, (1, f_in, t_in)),
        "length": (I64, (1,)),
        "encoder_output": (F32, (1, d, t)),
        "encoded_lengths": (I64, (1,)),
    }
    return nodes, consts, io_types


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
