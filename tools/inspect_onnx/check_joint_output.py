#!/usr/bin/env python3
"""Joint-component contract check (reference
tools/inspect_onnx/check_joint_output.py): the exported joint must have a
joint_vocab_size-wide output head (8198 at full size) and raw logits (no
LogSoftmax node).

    python tools/inspect_onnx/check_joint_output.py joint.onnx [--expect 8198]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.io.onnx_lite import read_onnx  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("joint_onnx")
    ap.add_argument("--expect", type=int, default=8198)
    args = ap.parse_args()

    m = read_onnx(args.joint_onnx)
    errs = []
    out_w = None
    for name, t in m.initializers.items():
        if name.endswith(("joint_net.2.weight",)):
            out_w = t
    if out_w is None:
        errs.append("no joint output projection initializer found")
    else:
        head = max(out_w.dims)
        if head != args.expect:
            errs.append(f"joint output head {head} != expected {args.expect}")
        else:
            print(f"joint output head size: {head} OK")
    if any(op == "LogSoftmax" for op in m.node_ops):
        errs.append("graph contains LogSoftmax — contract requires raw logits")
    else:
        print("no LogSoftmax node: raw logits OK")
    if not m.nodes:
        errs.append("no compute nodes — joint.onnx must be an executable "
                    "graph (run it with tools/onnx_exec.py)")
    else:
        from collections import Counter

        ops = Counter(m.node_ops)
        print(f"compute graph: {len(m.nodes)} nodes "
              f"({', '.join(f'{k}x{v}' for k, v in sorted(ops.items()))})")
    if "joint_output" not in m.outputs and m.outputs:
        errs.append(f"output name {m.outputs} != joint_output")
    for e in errs:
        print(f"FAIL: {e}")
    return 1 if errs else 0


if __name__ == "__main__":
    raise SystemExit(main())
