#!/usr/bin/env python3
"""Batch offline transcription CLI over ParakeetTDT.transcribe_batch.

    python tools/transcribe_batch.py a.wav b.wav ... \
        [--model-dir DIR | --synthetic-model tiny|full] \
        [--dp N --tp M] [--norm none|per_feature] [--batch 32] [--json]

One padded feature batch per --batch group, one batched encoder pass +
lockstep batched TDT decode; --dp/--tp shard the run over a device mesh
(GSPMD, parallel/mesh.py). Rows are token-exact with per-utterance
decoding (tests/test_transcribe_batch.py). Reference analog: none — the
reference CLI is strictly one utterance per process at B=1
(rust/cli/src/main.rs:484-536, SURVEY §2.5 DP row).
"""
import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()
    ap = argparse.ArgumentParser()
    ap.add_argument("wavs", nargs="+")
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--synthetic-model", default="", choices=["", "tiny", "full"])
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel mesh axis (0 = no mesh)")
    ap.add_argument("--tp", type=int, default=1)
    ap.add_argument("--norm", default="per_feature",
                    choices=["none", "per_feature"])
    ap.add_argument("--batch", type=int, default=32,
                    help="utterances per padded device batch")
    ap.add_argument("--json", action="store_true",
                    help="one JSON object per line instead of TSV")
    args = ap.parse_args()

    from trt_asr_tpu.config import ModelConfig, RuntimeConfig
    from trt_asr_tpu.io.wav import load_wav
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT

    rt = RuntimeConfig.from_env()
    if args.model_dir:
        model = ParakeetTDT.from_model_dir(args.model_dir, runtime=rt)
    elif args.synthetic_model:
        cfg = ModelConfig.tiny() if args.synthetic_model == "tiny" else ModelConfig()
        model = ParakeetTDT.random(cfg)
        model.runtime = rt
    else:
        ap.error("provide --model-dir or --synthetic-model")

    mesh = None
    if args.dp > 0:
        from trt_asr_tpu.parallel import make_mesh

        mesh = make_mesh(dp=args.dp, tp=args.tp)

    t0 = time.perf_counter()
    audio_sec = 0.0
    n_done = 0
    for g0 in range(0, len(args.wavs), args.batch):
        paths = args.wavs[g0 : g0 + args.batch]
        audios = [load_wav(p) for p in paths]
        audio_sec += sum(len(a) for a in audios) / 16000.0
        for path, (text, ids) in zip(
                paths, model.transcribe_batch(audios, norm=args.norm,
                                              mesh=mesh)):
            if args.json:
                print(json.dumps({"audio": path, "text": text,
                                  "tokens": ids}), flush=True)
            else:
                print(f"{path}\t{text}", flush=True)
            n_done += 1
    wall = time.perf_counter() - t0
    rtfx = audio_sec / wall if wall > 0 else float("inf")
    print(f"# {n_done} utterances, {audio_sec:.1f}s audio, "
          f"{wall:.2f}s wall, RTFx={rtfx:.1f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
