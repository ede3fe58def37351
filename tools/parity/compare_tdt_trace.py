#!/usr/bin/env python3
"""First-divergence comparison of two TDT decode traces (reference
tools/verify_nemo/compare_tdt_trace.py): step-by-step compare of
(time_idx, u, best_tok, duration, advance), reporting the first mismatch
with context.

    python tools/parity/compare_tdt_trace.py golden.jsonl other.jsonl
"""
import argparse
import json
import sys


def load_trace(path):
    meta, steps = {}, []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("type") == "meta":
                meta = rec
            elif rec.get("type") == "step":
                steps.append(rec)
    return meta, steps


KEYS = ("time_idx", "u", "best_tok", "duration", "advance", "is_blank")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("golden")
    ap.add_argument("other")
    ap.add_argument("--context", type=int, default=2)
    args = ap.parse_args()

    gm, gs = load_trace(args.golden)
    om, os_ = load_trace(args.other)
    if gm.get("blank_id") != om.get("blank_id"):
        print(f"meta mismatch: blank_id {gm.get('blank_id')} vs {om.get('blank_id')}")

    n = min(len(gs), len(os_))
    for i in range(n):
        diffs = [k for k in KEYS if gs[i].get(k) != os_[i].get(k)]
        if diffs:
            print(f"FIRST DIVERGENCE at step {i}: fields {diffs}")
            lo = max(0, i - args.context)
            for j in range(lo, min(n, i + args.context + 1)):
                mark = ">>" if j == i else "  "
                print(f"{mark} step {j} golden: "
                      f"{ {k: gs[j].get(k) for k in KEYS} }")
                print(f"{mark} step {j} other : "
                      f"{ {k: os_[j].get(k) for k in KEYS} }")
            return 1
    if len(gs) != len(os_):
        print(f"LENGTH MISMATCH: golden {len(gs)} steps vs other {len(os_)} "
              f"(first {n} identical)")
        return 1
    g_em = gm.get("emitted")
    o_em = om.get("emitted")
    if g_em is not None and o_em is not None and g_em != o_em:
        print(f"EMITTED MISMATCH: {g_em} vs {o_em}")
        return 1
    print(f"traces IDENTICAL: {n} steps, emitted={gm.get('emitted')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
