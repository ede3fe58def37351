#!/usr/bin/env python3
"""Tap analysis (reference tools/analyze_tap.py equivalent): stats from a
tap raw + sidecar; optional waveform/spectrogram plots when matplotlib is
available (not in this image — stats always work).

    python tools/analyze_tap.py <tap.f32> [--plot out.png]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tap", help="raw f32 tap file (expects <tap>.json sidecar)")
    ap.add_argument("--plot", default="", help="write waveform/spectrogram png (needs matplotlib)")
    args = ap.parse_args()

    sidecar_path = args.tap + ".json"
    meta = {}
    if os.path.exists(sidecar_path):
        with open(sidecar_path) as f:
            meta = json.load(f)
    raw = np.fromfile(args.tap, dtype=np.float32)
    bins = int(meta.get("bins", 0) or 0)

    print(f"tap: {args.tap}")
    print(f"kind: {meta.get('kind', 'unknown')} layout: {meta.get('layout', '?')}")
    if bins:
        frames = raw.size // bins
        x = raw[: frames * bins].reshape(frames, bins)
        print(f"frames={frames} bins={bins}")
        print(f"per-bin mean range: [{x.mean(0).min():.3f}, {x.mean(0).max():.3f}]")
        print(f"global: min={x.min():.3f} max={x.max():.3f} mean={x.mean():.3f}")
    else:
        x = raw
        peak = np.abs(x).max() if x.size else 0.0
        rms = float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
        print(f"samples={x.size} ({x.size/16000:.2f}s @16k)")
        print(f"peak={peak:.4f} rms={rms:.4f} "
              f"dbfs_peak={20*np.log10(peak) if peak>0 else -200:.1f}")
    nbad = int(np.size(raw) - np.isfinite(raw).sum())
    print(f"nan/inf: {nbad}")

    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib unavailable; skipping plot", file=sys.stderr)
            return 0
        fig, ax = plt.subplots(figsize=(10, 4))
        if bins:
            ax.imshow(x.T, aspect="auto", origin="lower")
            ax.set_xlabel("frame")
            ax.set_ylabel("mel bin")
        else:
            ax.plot(np.arange(x.size) / 16000.0, x, lw=0.3)
            ax.set_xlabel("time (s)")
        fig.savefig(args.plot, dpi=100)
        print(f"plot -> {args.plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
