#!/usr/bin/env python3
"""Beam-decode WER gate: the committed trained gate model
(artifacts/models/gate_r3, tools/run_gate_r3.sh) evaluated through the
streaming BEAM decoder on the exact held-out set the greedy gate used
(train_synthetic_e2e.make_set(seed=2)).

Purpose: the beam decoder's correctness anchors are token-exact beam=1
parity and scripted counterexamples on random weights; this closes the
loop on a TRAINED model — beam=1 must reproduce the greedy gate WER,
and beam>1 must not degrade it (on a well-trained model greedy is near
the argmax path, so beam is expected to match, not beat).

    python tools/gate_beam_eval.py [--model-dir artifacts/models/gate_r3]
        [--eval-utts 50] [--beams 1,2,4] [--gate-wer 0.05]
        [--artifact artifacts/e2e_wer_gate_beam.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_synthetic_e2e import make_set, make_words  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="artifacts/models/gate_r3")
    ap.add_argument("--out-dir", default="/tmp/gate_beam")
    ap.add_argument("--eval-utts", type=int, default=50)
    ap.add_argument("--vocab-size", type=int, default=1120)
    ap.add_argument("--words-per-utt", default="8,13")
    ap.add_argument("--beams", default="1,2,4")
    ap.add_argument("--stream-sim", type=float, default=0.5)
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

    from trt_asr_tpu.eval.manifest import ManifestEntry, write_manifest
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite
    from trt_asr_tpu.io.wav import save_wav

    words = make_words(args.vocab_size)
    w_lo, w_hi = (int(x) for x in args.words_per_utt.split(","))
    evals = make_set(args.eval_utts, 2, words, w_lo, w_hi)  # gate held-out
    os.makedirs(os.path.join(args.out_dir, "wavs"), exist_ok=True)
    entries = []
    for i, (ids, audio) in enumerate(evals):
        p = os.path.join(args.out_dir, "wavs", f"utt{i}.wav")
        save_wav(p, audio)
        entries.append(ManifestEntry(p, " ".join(words[k] for k in ids)))
    man = os.path.join(args.out_dir, "eval.tsv")
    write_manifest(man, entries)

    rows = {}
    for label, beam in [("greedy", 0)] + [
            (f"beam{b}", int(b)) for b in args.beams.split(",")]:
        t0 = time.time()
        res = run_suite(SuiteConfig(
            manifest_path=man,
            out_dir=os.path.join(args.out_dir, f"suite_{label}"),
            model_dir=args.model_dir, engine="python",
            variants=["base"], rounds=1, stream_sim=args.stream_sim,
            feature_norm="none", beam=beam))
        wer = res["variants"]["base"][0]["wer"]
        rows[label] = {k: wer[k] for k in
                       ("wer", "substitutions", "insertions", "deletions",
                        "ref_words", "empty_hypotheses")}
        rows[label]["wall_sec"] = round(time.time() - t0, 1)
        rows[label]["transcripts"] = [
            u["transcript"]
            for u in res["variants"]["base"][0]["utterances"]]
        print(f"{label:7s}: WER {wer['wer']*100:6.2f}% "
              f"(S={wer['substitutions']} I={wer['insertions']} "
              f"D={wer['deletions']} N={wer['ref_words']}) "
              f"{rows[label]['wall_sec']}s", flush=True)

    beam1_exact = (rows.get("beam1", {}).get("transcripts")
                   == rows["greedy"]["transcripts"])
    verdict = {
        "beam1_matches_greedy_transcripts": beam1_exact,
        "gate_wer": args.gate_wer,
        "pass_per_decoder": {k: rows[k]["wer"] <= args.gate_wer
                             for k in rows},
    }
    print(f"beam1 transcripts == greedy: {beam1_exact}")
    print("gate verdicts:", verdict["pass_per_decoder"])
    for r in rows.values():
        r.pop("transcripts")   # keep the artifact small
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump({"config": {k: v for k, v in vars(args).items()},
                       "rows": rows, "verdict": verdict}, f, indent=1)
        print(f"wrote {args.artifact}")
    ok = all(verdict["pass_per_decoder"].values()) and beam1_exact
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
