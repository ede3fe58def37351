#!/usr/bin/env python3
"""Tap analysis — reference tools/analyze_tap.py parity (stats + waveform/
spectrogram/mel plots + gap diagnostics + A/B compare).

Reads a raw f32 tap + its ``.f32.json`` sidecar (and the per-chunk
``.chunks.ndjson`` when present — trt_asr_tpu/debug/taps.py writes all
three) and produces:

- statistics: peak / RMS / DC offset, linear and dBFS, NaN/Inf counts
  (reference compute_stats, tools/analyze_tap.py:127-186)
- gap report: writer-side zero-filled gaps from the sidecar
  (``gap_count``/``gap_values_filled`` — audio_tap.h gap filling) AND
  analyzer-side inter-chunk wall-clock gaps from the NDJSON timestamps
  (chunks whose arrival spacing exceeds ``--gap-factor`` x the chunk's own
  audio duration: the capture stall signature)
- plots (``--plot out.png``): waveform + spectrogram for audio taps,
  mel image + per-frame energy for feature taps (reference plot_audio /
  plot_features, :217-322); matplotlib-optional — stats always work
- ``--compare other.f32``: aligned-prefix A/B (max/mean abs diff, first
  divergent index) for two taps of the same stream (reference
  compare_taps, :408-448)

    python tools/analyze_tap.py <tap.f32> [--plot out.png]
        [--compare other.f32] [--gap-factor 1.5] [--json]
"""
import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLE_RATE = 16000
FRAME_HOP_S = 0.010   # contract: 10 ms feature frames


def load_tap(path):
    meta = {}
    for cand in (path + ".json", os.path.splitext(path)[0] + ".json"):
        if os.path.exists(cand):
            with open(cand) as f:
                meta = json.load(f)
            break
    raw = np.fromfile(path, dtype=np.float32)
    nd = []
    nd_path = os.path.splitext(path)[0] + ".chunks.ndjson"
    if os.path.exists(nd_path):
        with open(nd_path) as f:
            nd = [json.loads(line) for line in f if line.strip()]
    return raw, meta, nd


def stats(x):
    finite = np.isfinite(x)
    xa = x[finite]
    peak = float(np.abs(xa).max()) if xa.size else 0.0
    rms = float(np.sqrt(np.mean(np.square(xa)))) if xa.size else 0.0
    dc = float(xa.mean()) if xa.size else 0.0
    db = lambda v: 20.0 * math.log10(v) if v > 0 else -200.0  # noqa: E731
    return {"num_values": int(x.size), "nan_inf": int(x.size - xa.size),
            "peak": peak, "rms": rms, "dc_offset": dc,
            "dbfs_peak": db(peak), "dbfs_rms": db(rms),
            "min": float(xa.min()) if xa.size else 0.0,
            "max": float(xa.max()) if xa.size else 0.0}


def gap_report(meta, nd, bins, gap_factor):
    """Writer-recorded fills + wall-clock arrival-spacing outliers."""
    rep = {"writer_gap_count": int(meta.get("gap_count", 0) or 0),
           "writer_gap_values_filled": int(meta.get("gap_values_filled", 0) or 0),
           "wall_gaps": []}
    for prev, cur in zip(nd, nd[1:]):
        dt = cur.get("t", 0) - prev.get("t", 0)
        n = prev.get("num_values", 0)
        dur = (n / bins * FRAME_HOP_S) if bins else (n / SAMPLE_RATE)
        if dur > 0 and dt > gap_factor * dur:
            rep["wall_gaps"].append(
                {"after_chunk": prev.get("chunk"), "wall_dt_s": round(dt, 4),
                 "chunk_audio_s": round(dur, 4),
                 "ratio": round(dt / dur, 2)})
    return rep


def plot(x, bins, out_path):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot", file=sys.stderr)
        return False
    fig, axes = plt.subplots(2, 1, figsize=(14, 8))
    if bins:
        frames = x.size // bins
        m = x[: frames * bins].reshape(frames, bins)
        im = axes[0].imshow(m.T, aspect="auto", origin="lower",
                            extent=[0, frames * FRAME_HOP_S, 0, bins])
        axes[0].set_title("log-mel features")
        axes[0].set_xlabel("time (s)")
        axes[0].set_ylabel("mel bin")
        fig.colorbar(im, ax=axes[0])
        t = np.arange(frames) * FRAME_HOP_S
        axes[1].plot(t, m.mean(axis=1), lw=0.8)
        axes[1].set_title("per-frame mean log-mel energy")
        axes[1].set_xlabel("time (s)")
    else:
        t = np.arange(x.size) / SAMPLE_RATE
        axes[0].plot(t, x, lw=0.3)
        axes[0].set_title("waveform")
        axes[0].set_xlabel("time (s)")
        axes[0].set_ylim(-1.05 * max(1e-3, np.abs(x).max()),
                         1.05 * max(1e-3, np.abs(x).max()))
        n_fft, hop = 512, 160
        if x.size >= n_fft:
            win = np.hanning(n_fft).astype(np.float32)
            n_frames = 1 + (x.size - n_fft) // hop
            idx = np.arange(n_fft)[None] + hop * np.arange(n_frames)[:, None]
            spec = np.abs(np.fft.rfft(x[idx] * win, axis=1)) ** 2
            sdb = 10 * np.log10(spec + 1e-10)
            axes[1].imshow(sdb.T, aspect="auto", origin="lower",
                           extent=[0, x.size / SAMPLE_RATE, 0,
                                   SAMPLE_RATE / 2 / 1000])
            axes[1].set_title("spectrogram (dB)")
            axes[1].set_ylabel("kHz")
        axes[1].set_xlabel("time (s)")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    print(f"plot -> {out_path}", file=sys.stderr)
    return True


def compare(a_path, b_path):
    a, _, _ = load_tap(a_path)
    b, _, _ = load_tap(b_path)
    n = min(a.size, b.size)
    d = np.abs(a[:n] - b[:n])
    first = int(np.argmax(d > 0)) if d.any() else -1
    return {"n_compared": int(n), "len_a": int(a.size), "len_b": int(b.size),
            "max_abs_diff": float(d.max()) if n else 0.0,
            "mean_abs_diff": float(d.mean()) if n else 0.0,
            "first_divergence_index": first if d.any() else None}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tap", help="raw f32 tap file (expects <tap>.f32.json sidecar)")
    ap.add_argument("--plot", default="",
                    help="write waveform/spectrogram (audio) or mel/energy "
                         "(features) png")
    ap.add_argument("--compare", default="",
                    help="second tap: aligned-prefix A/B diff")
    ap.add_argument("--gap-factor", type=float, default=1.5,
                    help="flag inter-chunk wall gaps exceeding this x the "
                         "chunk's audio duration")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable summary on stdout")
    args = ap.parse_args()

    raw, meta, nd = load_tap(args.tap)
    bins = int(meta.get("bins", 0) or 0)
    st = stats(raw)
    gaps = gap_report(meta, nd, bins, args.gap_factor)
    summary = {"tap": args.tap, "kind": meta.get("kind", "unknown"),
               "layout": meta.get("layout", "?"), "bins": bins,
               "chunks": meta.get("chunks", len(nd) or None),
               "stats": st, "gaps": gaps}
    if bins:
        summary["frames"] = raw.size // bins
        summary["duration_s"] = round(raw.size // bins * FRAME_HOP_S, 3)
    else:
        summary["duration_s"] = round(raw.size / SAMPLE_RATE, 3)
    if args.compare:
        summary["compare"] = compare(args.tap, args.compare)
    if args.plot:
        plot(raw, bins, args.plot)

    if args.json:
        print(json.dumps(summary, indent=1))
        return 0
    print(f"tap: {args.tap}  kind={summary['kind']} layout={summary['layout']}")
    if bins:
        print(f"frames={summary['frames']} bins={bins} "
              f"({summary['duration_s']}s of 10ms frames)")
    else:
        print(f"samples={raw.size} ({summary['duration_s']}s @16k)")
    print(f"peak={st['peak']:.4f} ({st['dbfs_peak']:.1f} dBFS)  "
          f"rms={st['rms']:.4f} ({st['dbfs_rms']:.1f} dBFS)  "
          f"dc={st['dc_offset']:.5f}")
    print(f"min={st['min']:.3f} max={st['max']:.3f} nan/inf={st['nan_inf']}")
    print(f"writer gaps: {gaps['writer_gap_count']} "
          f"({gaps['writer_gap_values_filled']} values zero-filled)")
    if gaps["wall_gaps"]:
        print(f"wall-clock gaps > {args.gap_factor}x chunk duration:")
        for g in gaps["wall_gaps"]:
            print(f"  after chunk {g['after_chunk']}: {g['wall_dt_s']}s "
                  f"for a {g['chunk_audio_s']}s chunk ({g['ratio']}x)")
    elif nd:
        print(f"wall-clock gaps: none ({len(nd)} chunks)")
    if args.compare:
        c = summary["compare"]
        print(f"compare vs {args.compare}: max={c['max_abs_diff']:.3e} "
              f"mean={c['mean_abs_diff']:.3e} "
              f"first_divergence={c['first_divergence_index']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
