#!/usr/bin/env python3
"""WER scorer CLI (reference tools/stt_suite/score_wer.py equivalent).

    python tools/stt_suite/score_wer.py --results suite_results.json
    python tools/stt_suite/score_wer.py --ref ref.txt --hyp hyp.txt
"""
import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.eval.wer import score_corpus, score_pair  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", help="suite_results.json from run_suite")
    ap.add_argument("--ref", help="reference text file (one utterance/line)")
    ap.add_argument("--hyp", help="hypothesis text file")
    args = ap.parse_args()

    if args.results:
        with open(args.results) as f:
            res = json.load(f)
        for variant, rounds in res["variants"].items():
            for r in rounds:
                utts = r["utterances"]
                wer = score_corpus((u["reference"], u["transcript"]) for u in utts)
                print(f"{variant} round {r['round']}: WER={wer['wer']*100:.2f}% "
                      f"(S={wer['substitutions']} I={wer['insertions']} "
                      f"D={wer['deletions']} N={wer['ref_words']}) "
                      f"empty={wer['empty_hypotheses']}/{wer['num_utterances']}")
        return 0
    if args.ref and args.hyp:
        with open(args.ref) as f:
            refs = [line.rstrip("\n") for line in f]
        with open(args.hyp) as f:
            hyps = [line.rstrip("\n") for line in f]
        wer = score_corpus(zip(refs, hyps))
        print(json.dumps({k: v for k, v in wer.items() if k != "per_utterance"}, indent=1))
        return 0
    print("provide --results or --ref/--hyp", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
