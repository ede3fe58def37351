"""CLI / replay harness.

Flag-compatible with the reference Rust CLI (rust/cli/src/main.rs:12-48):

    python -m trt_asr_tpu.cli <input> --model-dir DIR [--stream-sim S]
        [--raw-pcm] [--features-input] [--feature-norm none|per_feature]
        [--dump-features PATH] [--no-sleep] [--synthetic-model tiny|full]

Prints ``Partial:`` / ``Final:`` / ``Transcript:`` lines consumed by the
eval suite (reference tools/stt_suite/run_suite.py parses the same). Extra
over the reference: --no-sleep (replay faster than real time),
--synthetic-model (random weights, for harness testing without assets —
the analog of the reference's mock backend N7), --timestamps (word
timings), and --beam N (streaming n-best via the beam session, printing
``NBest: <score> <text>`` lines after the transcript).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.frontend import compute_per_feature_stats
from trt_asr_tpu.io.wav import load_raw_pcm_f32, load_wav
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import EventType, StreamingSession


def _load_features_replay(path: str, n_mels: int) -> np.ndarray:
    """Raw f32 + JSON sidecar replay (reference main.rs:209-338): layout
    bins_major [C,T] or frames_major [T,C]."""
    sidecar = path + ".json"
    layout, frames, bins = "frames_major", None, n_mels
    try:
        with open(sidecar) as f:
            meta = json.load(f)
        layout = meta.get("layout", layout)
        frames = meta.get("frames")
        bins = meta.get("bins", bins)
    except FileNotFoundError:
        pass
    raw = np.fromfile(path, dtype="<f4")
    if frames is None:
        frames = raw.size // bins
    a = raw[: frames * bins]
    return a.reshape(bins, frames).T if layout == "bins_major" else a.reshape(frames, bins)


def _drain(sess: StreamingSession, transcript_done=False) -> None:
    while True:
        ev = sess.poll_event()
        if ev is None:
            break
        if ev.type == EventType.PARTIAL_TEXT:
            print(f"Partial: {ev.text}", flush=True)
        elif ev.type == EventType.FINAL_TEXT:
            print(f"Final: {ev.text}", flush=True)
        elif ev.type == EventType.ERROR:
            print(f"Error: {ev.error_message}", file=sys.stderr, flush=True)


def _print_timestamps(sess: StreamingSession, args) -> None:
    if not args.timestamps:
        return
    for w in sess.word_timestamps():
        print(f"Word: [{w['start_s']:.2f} {w['end_s']:.2f}] {w['word']}",
              flush=True)


def main(argv=None) -> int:
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()  # sitecustomize may have forced the TPU
    ap = argparse.ArgumentParser(prog="trt-asr-tpu-cli", description=__doc__)
    ap.add_argument("input")
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--synthetic-model", choices=["tiny", "full"], default="")
    ap.add_argument("--stream-sim", type=float, default=0.0,
                    help="chunk size in seconds; 0 = offline one-shot")
    ap.add_argument("--raw-pcm", action="store_true")
    ap.add_argument("--features-input", action="store_true")
    ap.add_argument("--feature-norm", choices=["none", "per_feature"],
                    default=os.environ.get(
                        "TRT_ASR_FEATURE_NORM",
                        os.environ.get("PARAKEET_FEATURE_NORM", "per_feature")),
                    help="flag overrides the TRT_ASR_FEATURE_NORM / "
                         "PARAKEET_FEATURE_NORM env default (reference CLI "
                         "parity, rust/cli/src/main.rs:46,190)")
    ap.add_argument("--dump-features", default="")
    ap.add_argument("--no-sleep", action="store_true",
                    help="stream-sim without real-time pacing")
    ap.add_argument("--compile-cache", default="",
                    help="XLA persistent compilation cache dir (same as "
                         "TRT_ASR_COMPILE_CACHE): fresh processes reuse "
                         "compiled programs — tools/engine_build.py "
                         "--cache-dir populates it offline")
    ap.add_argument("--timestamps", action="store_true",
                    help="print word-level [start end] timings after the "
                         "transcript (frame-anchored TDT timestamps — "
                         "capability beyond the reference CLI)")
    ap.add_argument("--beam", type=int, default=0,
                    help="beam width; 0 (default) = greedy production "
                         "path. >0 decodes with the streaming beam "
                         "session and prints NBest lines (capability "
                         "beyond the greedy-only reference)")
    ap.add_argument("--beam-device", action="store_true",
                    help="run the beam search ON DEVICE (one jitted "
                         "program per chunk, no per-step host round "
                         "trips — decode/beam_device.py); n-best "
                         "identical to the host search. --lm/--bias "
                         "compile to device tables and ride along "
                         "(decode/lm_device.py)")
    ap.add_argument("--bias", default="",
                    help="comma-separated hotword phrases boosted during "
                         "beam decoding (decode/biasing.py contextual "
                         "biasing; requires --beam N)")
    ap.add_argument("--bias-bonus", type=float, default=3.0,
                    help="per-matched-token log-prob reward for --bias")
    ap.add_argument("--lm", default="",
                    help="n-gram LM file (decode/ngram_lm.py v1 JSON) for "
                         "shallow fusion; requires --beam N")
    ap.add_argument("--lm-weight", type=float, default=0.6,
                    help="fusion weight for --lm; default chosen by the "
                         "graded-ambiguity gate (PERFNOTES r5, "
                         "artifacts/e2e_wer_gate_lm_graded.json)")
    ap.add_argument("--srt", default="",
                    help="write an SRT subtitle file from the word "
                         "timestamps (io/subtitles.py; works with "
                         "--continuous too)")
    ap.add_argument("--vtt", default="",
                    help="write a WebVTT subtitle file (see --srt)")
    ap.add_argument("--continuous", action="store_true",
                    help="energy-endpointed continuous mode: segment the "
                         "input at sustained silence, print one "
                         "'Segment: [start end] text' line per utterance "
                         "(streaming/continuous.py; forces "
                         "--feature-norm none)")
    args = ap.parse_args(argv)

    if args.feature_norm not in ("none", "per_feature"):
        # argparse validates flag values against choices but NOT env-derived
        # defaults — a typo'd TRT_ASR_FEATURE_NORM would otherwise silently
        # decode unnormalized garbage
        ap.error(f"invalid feature norm {args.feature_norm!r} "
                 f"(TRT_ASR_FEATURE_NORM/PARAKEET_FEATURE_NORM env?)")
    rt = RuntimeConfig.from_env()
    if args.compile_cache:
        rt.compile_cache_dir = args.compile_cache   # flag > env
    if rt.compile_cache_dir:
        # apply here, not only inside ParakeetTDT.__init__: the synthetic-
        # model path constructs via ParakeetTDT.random() (default runtime)
        # and assigns rt afterwards, which would silently skip the cache
        from trt_asr_tpu.runtime.engine import apply_compile_cache

        apply_compile_cache(rt.compile_cache_dir)
    if args.model_dir:
        model = ParakeetTDT.from_model_dir(args.model_dir, runtime=rt)
    elif args.synthetic_model:
        cfg = ModelConfig.tiny() if args.synthetic_model == "tiny" else ModelConfig()
        model = ParakeetTDT.random(cfg)
        model.runtime = rt
    else:
        ap.error("provide --model-dir or --synthetic-model")

    beam = args.beam if args.beam > 0 else rt.beam_width  # flag > env
    # beam=1 is the exact-greedy special case (single argmax successor per
    # step, decode/beam.py): an LM/bias score could never change a token,
    # so accepting --lm/--bias there would silently decode unfused
    if args.bias and beam <= 1:
        ap.error("--bias requires beam decoding with --beam >= 2 "
                 "(beam 1 is exact greedy; fusion cannot apply)")
    if args.lm and beam <= 1:
        ap.error("--lm requires beam decoding with --beam >= 2 "
                 "(beam 1 is exact greedy; fusion cannot apply)")
    if args.lm and args.bias:
        ap.error("--lm and --bias both supply the fusion lm_fn; pick one")
    if args.beam_device and beam <= 0:
        ap.error("--beam-device requires --beam N")

    def make_session(**kw) -> StreamingSession:
        if beam > 0:
            from trt_asr_tpu.streaming.beam_session import BeamStreamingSession

            lm_kw = {}
            if args.bias:
                from trt_asr_tpu.decode.biasing import make_biasing_lm

                lm_kw = dict(lm_fn=make_biasing_lm(
                    args.bias.split(","), model.tokenizer,
                    bonus=args.bias_bonus), lm_weight=1.0)
            elif args.lm:
                from trt_asr_tpu.decode.ngram_lm import NGramLM

                lm_kw = dict(lm_fn=NGramLM.load(args.lm),
                             lm_weight=args.lm_weight)
            return BeamStreamingSession(model, beam=beam,
                                        device=args.beam_device,
                                        **lm_kw, **kw)
        return StreamingSession(model, **kw)

    def print_nbest(sess) -> None:
        if beam > 0:
            for text, _ids, score in sess.nbest():
                print(f"NBest: {score:.4f} {text}", flush=True)

    def write_subs(cues) -> None:
        from trt_asr_tpu.io.subtitles import format_srt, format_vtt

        if args.srt:
            with open(args.srt, "w") as fh:
                fh.write(format_srt(cues))
        if args.vtt:
            with open(args.vtt, "w") as fh:
                fh.write(format_vtt(cues))

    def write_subs_from_session(sess) -> None:
        if args.srt or args.vtt:
            from trt_asr_tpu.io.subtitles import pack_cues

            write_subs(pack_cues(sess.word_timestamps()))

    # ---- feature replay path ----
    if args.features_input:
        feats = _load_features_replay(args.input, model.cfg.feat_in)
        sess = make_session(runtime=rt, feature_norm="none")
        for start in range(0, feats.shape[0], 256):
            sess.push_features(feats[start : start + 256])
            _drain(sess)
        sess.finalize()
        _drain(sess)
        print(f"Transcript: {sess.text}", flush=True)
        print_nbest(sess)
        _print_timestamps(sess, args)
        write_subs_from_session(sess)
        return 0

    # ---- audio load ----
    if args.raw_pcm:
        audio = load_raw_pcm_f32(args.input)
    else:
        # auto-resample non-16k files (io/resample.py) — the reference
        # CLI hard-rejects them; strict harnesses still use load_wav
        import wave as _wave

        with _wave.open(args.input, "rb") as _w:
            in_rate = _w.getframerate()
        if in_rate != 16000:
            from trt_asr_tpu.io.resample import load_audio

            print(f"note: resampling {in_rate} Hz -> 16000 Hz",
                  file=sys.stderr)
            audio = load_audio(args.input)
        else:
            audio = load_wav(args.input)

    if args.continuous:
        from trt_asr_tpu.streaming.continuous import ContinuousTranscriber

        ct = ContinuousTranscriber(make_session(runtime=rt,
                                                feature_norm="none"))
        hop = (max(int(args.stream_sim * 16000), 1) if args.stream_sim > 0
               else max(len(audio), 1))
        for start in range(0, len(audio), hop):
            ct.push_audio(audio[start : start + hop])
        ct.flush()
        for seg in ct.segments:
            print(f"Segment: [{seg['start_s']:.2f} {seg['end_s']:.2f}] "
                  f"{seg['text']}", flush=True)
        print(f"Transcript: {' '.join(s['text'] for s in ct.segments if s['text'])}",
              flush=True)
        if args.srt or args.vtt:
            from trt_asr_tpu.io.subtitles import cues_from_segments

            write_subs(cues_from_segments(ct.segments))
        return 0

    if args.dump_features:
        feats = model.features(audio, norm=args.feature_norm)
        feats.astype("<f4").tofile(args.dump_features)
        with open(args.dump_features + ".json", "w") as f:
            json.dump({"layout": "frames_major", "frames": int(feats.shape[0]),
                       "bins": int(feats.shape[1])}, f)

    norm_stats = None
    if args.feature_norm == "per_feature":
        # stats over the WHOLE utterance, then applied per chunk
        # (reference main.rs:398-405; contract: not streaming-safe)
        full = np.asarray(model.frontend(audio))
        if full.shape[0] > 1:
            norm_stats = tuple(np.asarray(s) for s in compute_per_feature_stats(full))

    feature_norm = args.feature_norm if norm_stats is not None else "none"
    sess = make_session(runtime=rt, feature_norm=feature_norm,
                        norm_stats=norm_stats)

    if args.stream_sim > 0:
        hop = int(args.stream_sim * 16000)
        t_wall = time.monotonic()
        for i, start in enumerate(range(0, len(audio), hop)):
            sess.push_audio(audio[start : start + hop])
            _drain(sess)
            if not args.no_sleep:
                next_t = t_wall + (i + 1) * args.stream_sim
                time.sleep(max(0.0, next_t - time.monotonic()))
    else:
        sess.push_audio(audio)
        _drain(sess)
    sess.finalize()
    _drain(sess)
    print(f"Transcript: {sess.text}", flush=True)
    print_nbest(sess)
    _print_timestamps(sess, args)
    write_subs_from_session(sess)
    lat = sess.chunk_latencies_ms
    if lat:
        print(f"ChunkLatencyMs: p50={np.percentile(lat, 50):.2f} "
              f"p95={np.percentile(lat, 95):.2f} n={len(lat)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
