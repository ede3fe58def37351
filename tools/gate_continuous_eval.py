#!/usr/bin/env python3
"""Continuous-mode WER gate: concatenate the r3 gate's held-out
utterances (each ends in its natural >=0.6 s silence tail —
train_synthetic_e2e.synth_utterance) into ONE unbounded stream, run the
trained gate model through ContinuousTranscriber, and demand that the
endpointer recovers every utterance boundary AND every transcript.

This closes the continuous-mode loop on trained weights: the unit tests
prove segmentation mechanics (token-exactness per segment, granularity
invariance) on random models; here segmentation + recognition must
jointly reproduce the per-utterance gate result (0% WER) from a stream
with no utterance markers.

    python tools/gate_continuous_eval.py [--model-dir artifacts/models/gate_r3]
        [--eval-utts 50] [--silence-s 0.45] [--gate-wer 0.05]
        [--artifact artifacts/e2e_wer_gate_continuous.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

from train_synthetic_e2e import make_set, make_words  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="artifacts/models/gate_r3")
    ap.add_argument("--eval-utts", type=int, default=50)
    ap.add_argument("--vocab-size", type=int, default=1120)
    ap.add_argument("--words-per-utt", default="8,13")
    ap.add_argument("--silence-s", type=float, default=0.7,
                    help="endpoint threshold; ALSO the trailing silence a "
                         "segment keeps — this model family needs >=0.6 s "
                         "tail so the finalize flush lands in silence "
                         "(synth_utterance tail_s, CLAUDE.md)")
    ap.add_argument("--gap-s", type=float, default=0.6,
                    help="extra inter-utterance silence in the stream (the "
                         "utterances' own 0.6 s tails alone would sit "
                         "below silence-s and never endpoint)")
    ap.add_argument("--preroll-s", type=float, default=0.1,
                    help="leading context per segment; default matches the "
                         "training utterances' 0.08 s leading gap")
    ap.add_argument("--chunk-samples", type=int, default=8000)
    ap.add_argument("--gate-wer", type=float, default=0.05)
    ap.add_argument("--artifact", default="")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    args = ap.parse_args()

    # default CPU: the axon sitecustomize otherwise routes this in-process
    # tool through the TPU tunnel at ~minutes/utterance (docs/DEBUGGING.md
    # trap #5); one shared implementation, runtime/platform.py
    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()

    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.eval.wer import score_corpus
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.continuous import ContinuousTranscriber
    from trt_asr_tpu.streaming.session import StreamingSession

    words = make_words(args.vocab_size)
    w_lo, w_hi = (int(x) for x in args.words_per_utt.split(","))
    evals = make_set(args.eval_utts, 2, words, w_lo, w_hi)  # gate held-out
    refs = [" ".join(words[k] for k in ids) for ids, _ in evals]
    gap = np.zeros(int(args.gap_s * 16000), np.float32)
    parts = []
    for _, a in evals:
        parts += [a, gap]
    stream = np.concatenate(parts)
    print(f"stream: {len(stream)/16000:.1f}s audio, "
          f"{len(evals)} utterances", flush=True)

    model = ParakeetTDT.from_model_dir(args.model_dir)
    ct = ContinuousTranscriber(
        StreamingSession(model, RuntimeConfig()), silence_s=args.silence_s,
        preroll_s=args.preroll_s)
    t0 = time.time()
    for s in range(0, len(stream), args.chunk_samples):
        ct.push_audio(stream[s : s + args.chunk_samples])
    ct.flush()
    wall = time.time() - t0

    segs = ct.segments
    print(f"{len(segs)} segments in {wall:.1f}s "
          f"(RTFx {len(stream)/16000/wall:.1f})", flush=True)
    seg_ok = len(segs) == len(evals)
    hyps = [s["text"] for s in segs]
    if not seg_ok:
        # still score: align by order, pad the shorter side
        n = max(len(hyps), len(refs))
        hyps = (hyps + [""] * n)[:n]
    wer = score_corpus(zip(refs, (hyps + [""] * len(refs))[: len(refs)]))
    wer_row = {k: wer[k] for k in ("wer", "substitutions", "insertions",
                                   "deletions", "ref_words",
                                   "empty_hypotheses")}
    print(f"segments == utterances: {seg_ok}")
    print(f"WER {wer['wer']*100:.2f}% (S={wer['substitutions']} "
          f"I={wer['insertions']} D={wer['deletions']} "
          f"N={wer['ref_words']})")
    ok = seg_ok and wer["wer"] <= args.gate_wer
    print(f"GATE {'PASS' if ok else 'FAIL'}")
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump({
                "config": vars(args),
                "n_utterances": len(evals),
                "n_segments": len(segs),
                "segments_match_utterances": seg_ok,
                "wer": wer_row,
                "wall_sec": round(wall, 1),
                "rtfx": round(len(stream) / 16000 / wall, 1),
                "boundaries": [
                    {"start_s": round(s["start_s"], 2),
                     "end_s": round(s["end_s"], 2)} for s in segs],
                "pass": ok,
            }, f, indent=1)
        print(f"wrote {args.artifact}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
