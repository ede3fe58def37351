#!/usr/bin/env python3
"""LM-fusion WER measurement on the trained gate model under noise.

The clean gate is 0% WER (greedy is already the argmax path) so fusion has
nothing to fix there; under additive noise the gate model degrades (r3
artifact: 77% WER at 15 dB), which is exactly where an external LM earns
its keep. This tool trains a token n-gram LM on the TRAINING distribution's
texts (decode/ngram_lm.py — under this corpus's uniform random word order
the LM carries no cross-word information, so whatever it wins comes from
modelling VALID WORD-INTERNAL token sequences: a vocabulary constraint,
the weakest honest version of LM fusion) and sweeps lm_weight over the
noisy held-out set at fixed beam:

    python tools/gate_lm_eval.py [--model-dir artifacts/models/gate_r3]
        [--snr-db 15] [--beam 4] [--lm-weights 0,0.2,0.4]
        [--artifact artifacts/e2e_wer_gate_lm.json]

Verdict: the best fused row must be <= the unfused beam row (fusion must
never hurt at the chosen weights), and the artifact records the full sweep
either way.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_synthetic_e2e import add_noise, make_set, make_words  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="artifacts/models/gate_r3")
    ap.add_argument("--out-dir", default="/tmp/gate_lm")
    ap.add_argument("--eval-utts", type=int, default=30)
    ap.add_argument("--lm-train-utts", type=int, default=2000,
                    help="text-only sentences for LM fitting (the training "
                         "distribution, seed=1 — no audio synthesized)")
    ap.add_argument("--vocab-size", type=int, default=1120)
    ap.add_argument("--words-per-utt", default="8,13")
    ap.add_argument("--snr-db", type=float, default=15.0)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--lm-weights", default="0,0.2,0.4")
    ap.add_argument("--stream-sim", type=float, default=0.5)
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

    import numpy as np

    from trt_asr_tpu.decode.ngram_lm import fit_from_text
    from trt_asr_tpu.eval.manifest import ManifestEntry, write_manifest
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite
    from trt_asr_tpu.io.wav import save_wav
    from trt_asr_tpu.tokenizer import Tokenizer

    words = make_words(args.vocab_size)
    w_lo, w_hi = (int(x) for x in args.words_per_utt.split(","))

    # LM corpus: the training text distribution, sampled text-only with the
    # same geometry as make_set(seed=1) (no audio — only sentences matter)
    r = np.random.default_rng(1)
    corpus = []
    for i in range(args.lm_train_utts):
        k = int(r.integers(w_lo, w_hi))
        ids = [(i * 3) % len(words)] + list(r.integers(0, len(words), size=k - 1))
        corpus.append(" ".join(words[j] for j in ids))
    tok = Tokenizer.from_file(os.path.join(args.model_dir, "vocab.txt"))
    t0 = time.time()
    lm = fit_from_text(corpus, tok, order=args.order)
    lm_path = os.path.join(args.out_dir, "lm.json")
    os.makedirs(args.out_dir, exist_ok=True)
    lm.save(lm_path)
    print(f"LM: order-{args.order}, {len(lm.counts)} contexts from "
          f"{len(corpus)} sentences ({time.time()-t0:.1f}s)", flush=True)

    # noisy held-out set (the gate's seed=2 utterances + additive noise)
    evals = make_set(args.eval_utts, 2, words, w_lo, w_hi)
    nrng = np.random.default_rng(99)
    os.makedirs(os.path.join(args.out_dir, "wavs"), exist_ok=True)
    entries = []
    for i, (ids, audio) in enumerate(evals):
        p = os.path.join(args.out_dir, "wavs", f"utt{i}.wav")
        save_wav(p, add_noise(audio, args.snr_db, nrng))
        entries.append(ManifestEntry(p, " ".join(words[k] for k in ids)))
    man = os.path.join(args.out_dir, "eval.tsv")
    write_manifest(man, entries)

    rows = {}
    weights = [float(x) for x in args.lm_weights.split(",")]
    if 0.0 not in weights:
        # the unfused baseline anchors the verdict; run it even if the
        # caller only listed fused weights (otherwise the verdict lookup
        # would fail AFTER the whole expensive sweep)
        weights.insert(0, 0.0)
    for w in weights:
        label = f"beam{args.beam}_lm{w:g}"
        t0 = time.time()
        res = run_suite(SuiteConfig(
            manifest_path=man,
            out_dir=os.path.join(args.out_dir, f"suite_{label}"),
            model_dir=args.model_dir, engine="python",
            variants=["base"], rounds=1, stream_sim=args.stream_sim,
            feature_norm="none", beam=args.beam,
            lm_path=lm_path if w > 0 else "", lm_weight=w))
        wer = res["variants"]["base"][0]["wer"]
        rows[label] = {**{k: wer[k] for k in
                          ("wer", "substitutions", "insertions", "deletions",
                           "ref_words")},
                       "lm_weight": w,
                       "wall_sec": round(time.time() - t0, 1)}
        print(f"{label:16s}: WER {wer['wer']*100:6.2f}% "
              f"(S={wer['substitutions']} I={wer['insertions']} "
              f"D={wer['deletions']}) {rows[label]['wall_sec']}s", flush=True)

    base_label = f"beam{args.beam}_lm0"
    base = rows[base_label]["wer"]
    # the verdict must be falsifiable: best is taken over FUSED rows only
    # (w>0). Including the unfused baseline made "best <= base" true by
    # construction, so the tool could never fail even when fusion hurt at
    # every weight (ADVICE r3).
    fused = {k: v for k, v in rows.items() if v["lm_weight"] > 0}
    if not fused:
        print("no fused (w>0) rows — nothing to verdict", file=sys.stderr)
        return 2
    best_label = min(fused, key=lambda k: fused[k]["wer"])
    verdict = {
        "unfused_wer": base,
        "best_fused": {"label": best_label, "wer": rows[best_label]["wer"]},
        "fusion_never_hurts_at_best": rows[best_label]["wer"] <= base,
        "abs_improvement": base - rows[best_label]["wer"],
    }
    print(f"unfused {base*100:.2f}% -> best {best_label} "
          f"{rows[best_label]['wer']*100:.2f}%")
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump({"config": vars(args), "snr_db": args.snr_db,
                       "rows": rows, "verdict": verdict}, f, indent=1)
        print(f"wrote {args.artifact}")
    return 0 if verdict["fusion_never_hurts_at_best"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
