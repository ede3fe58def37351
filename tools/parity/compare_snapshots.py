#!/usr/bin/env python3
"""Diff two per-chunk snapshot-dump runs (TRT_ASR_SNAPSHOT_DIR).

Reference parity: tools/onnxruntime/compare_encoder_step0.py (ORT-vs-TRT
step-0 comparison from PARAKEET_TDT_SNAPSHOT_DIR raw-f32 dumps, the tool
that localized the reference's encoder drift to one component) generalized
to every chunk: given two snapshot directories from two runs of the SAME
audio through DIFFERENT backends/configs (e.g. CPU f32 session vs TPU bf16,
or pre/post a model change), report per-tensor error percentiles across
chunks, token-stream divergence, and the FIRST chunk where each tensor
exceeds tolerance — the drift-forensics entry point when closed-loop parity
fails.

    python tools/parity/compare_snapshots.py <dir_a> <dir_b>
        [--atol 1e-4] [--summary out.json]

Exit 0 iff every compared tensor stays within atol on every common chunk
and the token streams are identical.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

TENSORS = ("att_cache", "time_cache", "pred_g", "pred_h", "pred_c")
SHAPE_KEY = {"att_cache": "att_cache_shape", "time_cache": "time_cache_shape",
             "pred_g": "g_shape", "pred_h": "h_shape", "pred_c": "h_shape"}


def _load_chunk(d: str):
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    tensors = {}
    for t in TENSORS:
        p = os.path.join(d, t + ".f32")
        if os.path.exists(p):
            arr = np.fromfile(p, np.float32)
            shape = meta.get(SHAPE_KEY[t])
            if shape and int(np.prod(shape)) == arr.size:
                arr = arr.reshape(shape)
            tensors[t] = arr
    return meta, tensors


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--summary", default="")
    args = ap.parse_args()

    chunks_a = sorted(x for x in os.listdir(args.dir_a)
                      if x.startswith("chunk_"))
    chunks_b = {x for x in os.listdir(args.dir_b) if x.startswith("chunk_")}
    common = [c for c in chunks_a if c in chunks_b]
    if not common:
        print("no common chunk_* dirs")
        return 1
    only_a = len(chunks_a) - len(common)
    only_b = len(chunks_b) - len(common) if chunks_b else 0
    if only_a or only_b:
        print(f"note: {only_a} chunks only in A, {only_b} only in B; "
              f"comparing {len(common)} common")

    errs = {t: [] for t in TENSORS}
    first_bad = {}
    token_diverge = None
    ok = True
    for c in common:
        meta_a, ta = _load_chunk(os.path.join(args.dir_a, c))
        meta_b, tb = _load_chunk(os.path.join(args.dir_b, c))
        if token_diverge is None and meta_a.get("tokens") != meta_b.get("tokens"):
            token_diverge = (c, meta_a.get("tokens"), meta_b.get("tokens"))
        for t in TENSORS:
            if t not in ta or t not in tb:
                continue
            if ta[t].shape != tb[t].shape:
                print(f"{c} {t}: shape {ta[t].shape} vs {tb[t].shape}")
                ok = False
                first_bad.setdefault(t, c)
                continue
            e = float(np.max(np.abs(ta[t] - tb[t]))) if ta[t].size else 0.0
            errs[t].append(e)
            if e > args.atol and t not in first_bad:
                first_bad[t] = c
                ok = False

    report = {"chunks_compared": len(common), "atol": args.atol,
              "tensors": {}, "first_divergence": first_bad}
    for t, es in errs.items():
        if not es:
            continue
        a = np.array(es)
        report["tensors"][t] = {
            "max_abs": float(a.max()),
            "p95": float(np.percentile(a, 95)),
            "mean": float(a.mean()),
            "n": len(es),
        }
        mark = "" if float(a.max()) <= args.atol else \
            f"  FIRST BAD {first_bad.get(t)}"
        print(f"{t:12s} max {a.max():.3e}  p95 {np.percentile(a, 95):.3e}"
              f"  over {len(es)} chunks{mark}")

    if token_diverge is not None:
        c, tok_a, tok_b = token_diverge
        print(f"TOKENS DIVERGE at {c}: a={tok_a} b={tok_b}")
        report["token_divergence_chunk"] = c
        ok = False
    else:
        print("token streams identical on all common chunks")

    report["pass"] = bool(ok)
    if args.summary:
        with open(args.summary, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.summary}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
