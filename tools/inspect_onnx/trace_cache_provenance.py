#!/usr/bin/env python3
"""Cache-provenance tracer for the exported streaming encoder graph.

Reference parity: tools/onnxruntime/inspect_streaming_cache_graph.py:49-104
(BFS back from each cache output printing the producer chain — the tool the
reference used to localize its cache_last_time export bug, where a cache
output turned out not to depend on the current chunk). This version adds an
automated verdict on top of the trace: every cache output must transitively
depend BOTH on the fresh chunk content (`audio_signal`) and on its own
carried-in cache tensor, and the length bookkeeping output must derive from
the length input through ADVANCING arithmetic (Add/Sub/Sum; a pure
Identity/Reshape pass-through OR a bounding-only Clip/Min/Max of the
carried len — a len that never advances — fails) — the exact invariants
whose violation produced the reference's frozen-cache failure mode.

    python tools/inspect_onnx/trace_cache_provenance.py <export_dir_or_onnx>
        [--depth 6] [--quiet]

Exit 0 only if all provenance invariants hold.
"""
from __future__ import annotations

import argparse
import os
import sys
from collections import deque

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.io.onnx_lite import read_onnx  # noqa: E402

# cache output -> inputs it MUST transitively depend on
REQUIRED_DEPS = {
    "cache_last_channel_out": ("audio_signal", "cache_last_channel"),
    "cache_last_time_out": ("audio_signal", "cache_last_time"),
    "cache_last_channel_len_out": ("cache_last_channel_len",),
}

# ops that can actually ADVANCE the length value. Bounding ops (Clip /
# Min / Max) and data movers (Identity / Cast / Reshape / ...) cannot: a
# len_out of Clip(len_in, 0, C) is exactly the never-advancing frozen-cache
# failure mode and must FAIL, so the check requires at least one op from
# this set rather than merely one op outside a pass-through set.
ADVANCING_OPS = frozenset({"Add", "Sub", "Sum"})


def _producer_map(m):
    prod = {}
    for node in m.nodes:
        for out in node.outputs:
            prod[out] = node
    return prod


def _preview(t):
    a = t.array
    if a is None:
        return f"<external shape={list(t.dims)}>"
    flat = a.reshape(-1)
    if flat.size == 1:
        return str(flat[0])
    return f"{flat[:6].tolist()} (shape={list(a.shape)})"


def trace(name, prod, inits, graph_inputs, max_depth, quiet):
    """Depth-limited BFS print + full-depth reachable-input/op collection."""
    if not quiet:
        print(f"\n=== {name} (printed to depth {max_depth}) ===")
    reached_inputs = set()
    ops_seen = set()
    seen = set()
    q = deque([(name, 0)])
    while q:
        cur, depth = q.popleft()
        if cur in seen and depth > max_depth:
            continue
        pad = "  " * min(depth, max_depth)
        if cur in graph_inputs:
            reached_inputs.add(cur)
            if not quiet and depth <= max_depth:
                print(f"{pad}input: {cur}")
            continue
        if cur in inits:
            if not quiet and depth <= max_depth:
                print(f"{pad}initializer: {cur} = {_preview(inits[cur])}")
            continue
        node = prod.get(cur)
        if node is None:
            if not quiet and depth <= max_depth:
                print(f"{pad}unresolved: {cur}")
            continue
        if cur not in seen and not quiet and depth <= max_depth:
            print(f"{pad}{node.op_type} name={node.name or '<anon>'} "
                  f"-> {list(node.outputs)}")
        if cur in seen:
            continue
        seen.add(cur)
        ops_seen.add(node.op_type)
        for inp in node.inputs:
            if inp:
                q.append((inp, depth + 1))
    return reached_inputs, ops_seen


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help="export dir or encoder_streaming.onnx")
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--quiet", action="store_true",
                    help="verdict only, no trace printout")
    args = ap.parse_args()

    path = args.path
    if os.path.isdir(path):
        path = os.path.join(path, "encoder_streaming.onnx")
    m = read_onnx(path)
    prod = _producer_map(m)
    graph_inputs = set(m.inputs)

    failures = []
    for out_name, required in REQUIRED_DEPS.items():
        if out_name not in m.outputs:
            failures.append(f"{out_name}: not a graph output")
            continue
        reached, ops_seen = trace(out_name, prod, m.initializers,
                                  graph_inputs, args.depth, args.quiet)
        for need in required:
            status = "ok" if need in reached else "MISSING"
            print(f"{out_name}: depends on {need}: {status}")
            if need not in reached:
                failures.append(f"{out_name} does not depend on {need} — "
                                "cache carryover/update is broken in the "
                                "exported graph")
        if out_name == "cache_last_channel_len_out":
            adv_ops = ops_seen & ADVANCING_OPS
            status = "ok" if adv_ops else "MISSING"
            print(f"{out_name}: advancing arithmetic "
                  f"({sorted(adv_ops) or sorted(ops_seen)}): {status}")
            if not adv_ops:
                failures.append(f"{out_name} has no advancing arithmetic "
                                f"(only {sorted(ops_seen)}) — the cache "
                                "length never advances")

    if failures:
        for f in failures:
            print(f"FAIL: {f}")
        return 1
    print("cache provenance OK: all cache outputs derive from the fresh "
          "chunk and their carried-in state")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
