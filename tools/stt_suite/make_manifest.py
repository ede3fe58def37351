#!/usr/bin/env python3
"""Manifest maker (reference make_manifest.py / make_gate_manifest.py).

    python tools/stt_suite/make_manifest.py --root DIR --out m.tsv [--gate N]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.eval.manifest import (  # noqa: E402
    make_gate_manifest,
    scan_wav_tree,
    write_manifest,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="directory of .wav (+.txt/.trans.txt)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gate", type=int, default=0,
                    help="pin a gate subset of N files with sha256")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    entries = scan_wav_tree(args.root)
    if not entries:
        print(f"no wav files under {args.root}", file=sys.stderr)
        return 1
    if args.gate:
        picked = make_gate_manifest(entries, args.out, per_bucket=args.gate, seed=args.seed)
        print(f"gate manifest: {len(picked)} pinned entries -> {args.out}")
    else:
        write_manifest(args.out, entries)
        print(f"manifest: {len(entries)} entries -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
