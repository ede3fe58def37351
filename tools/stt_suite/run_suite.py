#!/usr/bin/env python3
"""Eval suite CLI (reference tools/stt_suite/run_suite.py equivalent).

    python tools/stt_suite/run_suite.py --manifest m.tsv --out-dir artifacts/suite \
        [--model-dir DIR | --synthetic-model tiny] \
        [--engine python|cli|native|batch] [--batch-size 4] [--beam N] \
        [--variants base,nocache] [--rounds 2] [--stream-sim 0.5] [--gate-wer 0.1]
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.eval.suite import SuiteConfig, run_suite  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--synthetic-model", default="", choices=["", "tiny", "full"])
    ap.add_argument("--engine", default="python",
                    choices=["python", "cli", "native", "batch"])
    ap.add_argument("--native-cli", default="cpp/build/trt_asr_cli")
    ap.add_argument("--batch-size", type=int, default=4,
                    help="engine=batch: concurrent lockstep slots")
    ap.add_argument("--beam", type=int, default=0,
                    help=">0: streaming beam decoding (python/cli engines)")
    ap.add_argument("--variants", default="base")
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--stream-sim", type=float, default=0.5)
    ap.add_argument("--feature-norm", default="per_feature",
                    choices=["none", "per_feature"])
    ap.add_argument("--verify-sha", action="store_true")
    ap.add_argument("--gate-wer", type=float, default=None,
                    help="exit 1 if base-variant WER exceeds this fraction")
    args = ap.parse_args()

    cfg = SuiteConfig(
        manifest_path=args.manifest, out_dir=args.out_dir,
        model_dir=args.model_dir, engine=args.engine, native_cli=args.native_cli,
        variants=args.variants.split(","), rounds=args.rounds,
        stream_sim=args.stream_sim, feature_norm=args.feature_norm,
        verify_sha=args.verify_sha, synthetic_model=args.synthetic_model,
        batch_size=args.batch_size, beam=args.beam)
    results = run_suite(cfg)

    worst = 0.0
    for variant, rounds in results["variants"].items():
        for r in rounds:
            w = r["wer"]["wer"]
            lat = r.get("latency_ms") or {}
            print(f"{variant} round {r['round']}: WER={w*100:.2f}% "
                  f"empty={r['wer']['empty_hypotheses']} "
                  f"rtfx={r['rtfx'] if r['rtfx'] is None else round(r['rtfx'], 1)} "
                  f"lat_p50={lat.get('p50')}")
            if variant == "base":
                worst = max(worst, w)
    if args.gate_wer is not None and worst > args.gate_wer:
        print(f"WER GATE FAIL: {worst:.4f} > {args.gate_wer}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
