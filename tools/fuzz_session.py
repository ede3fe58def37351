#!/usr/bin/env python3
"""Randomized property fuzz over the streaming runtime surfaces.

The deterministic suite pins each invariant at fixed geometries
(tests/test_session.py, test_snapshot_restore.py, test_batch_engine.py);
this harness sweeps them under RANDOM utterance lengths, push plans, and
interruption points — the reference's replay-driven debugging methodology
(README.md:216-230 deterministic replay) turned proactive.

Per seed, one random utterance is decoded through every surface and all
must be token-exact with the canonical single-push session:

  single    one push + finalize (the canonical transcript)
  shreds    random push granularity (1-sample to multi-second pushes)
  snapshot  snapshot at a random push boundary -> restore into a FRESH
            session object -> continue
  engine    BatchStreamingEngine slot (alongside a decoy stream), random
            per-step feed sizes
  beam1     streaming beam session with beam=1 (anchors beam to greedy)
  batchbeam BatchStreamingEngine(beam=4) slot (decoy alongside, random
            per-step feeds) vs a standalone device-beam session — the
            batched beam's reference is the BEAM transcript, not greedy's
  onnx      (opt-in, --surfaces onnx) the pure-numpy exported-ONNX
            pipeline — the op-level-independent 4th implementation —
            against a flag-matched session, identical random feature
            pushes (artifacts/fuzz_onnx_surface.json)

    python tools/fuzz_session.py --seeds 50 --out artifacts/fuzz_session.json

Any divergence prints the seed + surface + first differing token index and
exits 1; replay a failure with --seeds 1 --seed-base <seed>.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def random_audio(rng: np.random.Generator, n: int) -> np.ndarray:
    """Band-limited noise with amplitude modulation — enough spectral
    structure that random-weight models emit non-trivial token streams."""
    t = np.arange(n, dtype=np.float32)
    sig = np.zeros(n, np.float32)
    for _ in range(4):
        f = rng.uniform(0.005, 0.6)
        sig += rng.uniform(0.1, 0.5) * np.sin(f * t + rng.uniform(0, 6.28)).astype(np.float32)
    env = 0.5 + 0.5 * np.sin(rng.uniform(0.0005, 0.005) * t)
    return (sig * env * 0.2 + 0.02 * rng.standard_normal(n)).astype(np.float32)


def random_pushes(rng: np.random.Generator, n: int) -> list:
    """Cut [0, n) into random push sizes spanning 4 orders of magnitude."""
    cuts, i = [], 0
    while i < n:
        step = int(rng.choice([1, 7, 160, 1600, 4000, 16000, 48000]))
        cuts.append((i, min(i + step, n)))
        i += step
    return cuts


def run_seed(model, seed: int, surfaces) -> dict:
    from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
    from trt_asr_tpu.streaming.session import StreamingSession

    rng = np.random.default_rng(seed)
    n = int(rng.integers(int(0.3 * 16000), 8 * 16000))
    audio = random_audio(rng, n)

    ref = StreamingSession(model)
    ref.push_audio(audio)
    ref.finalize()
    want = list(ref._tokens)
    got = {"single": want}

    if "shreds" in surfaces:
        s = StreamingSession(model)
        for a, b in random_pushes(rng, n):
            s.push_audio(audio[a:b])
        s.finalize()
        got["shreds"] = list(s._tokens)

    if "snapshot" in surfaces:
        cuts = random_pushes(rng, n)
        k = int(rng.integers(0, len(cuts)))
        s = StreamingSession(model)
        for a, b in cuts[:k]:
            s.push_audio(audio[a:b])
        snap = s.snapshot()
        s2 = StreamingSession(model)
        s2.restore(snap)
        for a, b in cuts[k:]:
            s2.push_audio(audio[a:b])
        s2.finalize()
        got["snapshot"] = list(s2._tokens)

    if "engine" in surfaces:
        eng = BatchStreamingEngine(model, batch_size=2)
        sid = eng.open_stream()
        decoy = eng.open_stream()
        rng2 = np.random.default_rng(seed + 1)
        decoy_audio = random_audio(rng2, n)
        i = j = 0
        while i < n or j < n:
            if i < n:
                step = int(rng.choice([1600, 4000, 16000]))
                eng.push_audio(sid, audio[i:i + step])
                i += step
            if j < n:
                eng.push_audio(decoy, decoy_audio[j:j + 8000])
                j += 8000
            eng.step()
        eng.finalize_stream(sid)
        eng.finalize_stream(decoy)
        eng.run_until_drained()
        got["engine"] = list(eng._tokens[sid])

    if "beam1" in surfaces:
        s = BeamStreamingSession(model, beam=1)
        for a, b in random_pushes(rng, n):
            s.push_audio(audio[a:b])
        s.finalize()
        got["beam1"] = list(s._tokens)

    wants = {name: want for name in got}
    if "onnx" in surfaces:
        # the pure-numpy exported-ONNX pipeline (the op-level-independent
        # 4th implementation) under random geometry. The pipeline has no
        # leading-punct suppression, so its reference is a session with
        # the same flags (mirrors tests/test_onnx_pipeline.py); both sides
        # consume identical FEATURES in random row-granularity pushes.
        from tools.onnx_pipeline import OnnxStreamingPipeline
        from trt_asr_tpu.config import RuntimeConfig

        export_dir = _ensure_export(model)
        feats = np.asarray(model.features(audio, norm="none"))
        ref2 = StreamingSession(
            model, RuntimeConfig(suppress_leading_punct=False))
        pipe = OnnxStreamingPipeline(export_dir)
        t_rows = feats.shape[0]
        cuts = [(max(0, a // 160), max(0, b // 160))
                for a, b in random_pushes(rng, n)]
        done = 0
        for _, b in cuts:
            b = min(b, t_rows)
            if b > done:
                ref2.push_features(feats[done:b])
                pipe.push_features(feats[done:b])
                done = b
        if done < t_rows:
            ref2.push_features(feats[done:])
            pipe.push_features(feats[done:])
        ref2.finalize()
        pipe.finalize()
        got["onnx"] = list(pipe.tokens)
        wants["onnx"] = list(ref2._tokens)

    if "batchbeam" in surfaces:
        # batched device beam (VERDICT r4 #3): an engine slot at beam=4
        # (decoy stream alongside, random per-step feeds) must be
        # token-exact with a standalone device-beam session on the same
        # audio; its reference is the beam transcript, not greedy's.
        from trt_asr_tpu.streaming.schedule import ChunkScheduler

        ref_b = BeamStreamingSession(model, beam=4, device=True)
        ref_b._sched = ChunkScheduler(model.cfg, unified=True)
        ref_b.push_audio(audio)
        ref_b.finalize()
        eng = BatchStreamingEngine(model, batch_size=2, beam=4)
        sid = eng.open_stream()
        decoy = eng.open_stream()
        rng3 = np.random.default_rng(seed + 2)
        decoy_audio = random_audio(np.random.default_rng(seed + 3), n)
        i = j = 0
        while i < n or j < n:
            if i < n:
                step = int(rng3.choice([1600, 4000, 16000]))
                eng.push_audio(sid, audio[i:i + step])
                i += step
            if j < n:
                eng.push_audio(decoy, decoy_audio[j:j + 8000])
                j += 8000
            eng.step()
        eng.finalize_stream(sid)
        eng.finalize_stream(decoy)
        eng.run_until_drained()
        got["batchbeam"] = list(eng._tokens[sid])
        wants["batchbeam"] = list(ref_b._tokens)

    fails = {}
    for name, toks in got.items():
        w = wants[name]
        if toks != w:
            div = next((i for i, (x, y) in enumerate(zip(toks, w)) if x != y),
                       min(len(toks), len(w)))
            fails[name] = {"len": len(toks), "want_len": len(w),
                           "first_divergence": div}
    return {"seed": seed, "samples": n, "tokens": len(want),
            "surfaces": sorted(got), "fails": fails}


_EXPORT_DIR = {}


def _ensure_export(model) -> str:
    """Export the model's executable ONNX graphs once per process (the
    onnx fuzz surface's system under test)."""
    key = id(model)
    if key not in _EXPORT_DIR:
        import tempfile

        from trt_asr_tpu.io.onnx_weights import export_params_to_onnx

        d = tempfile.mkdtemp(prefix="fuzz_onnx_")
        export_params_to_onnx(model.params, model.cfg, d,
                              prompt_ids=model.prompt_ids)
        _EXPORT_DIR[key] = d
    return _EXPORT_DIR[key]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--surfaces",
                    default="shreds,snapshot,engine,beam1,batchbeam")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    # default CPU: the axon sitecustomize otherwise routes this in-process
    # tool through the TPU tunnel at ~minutes/utterance (docs/DEBUGGING.md
    # trap #5); one shared implementation, runtime/platform.py
    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=7)
    surfaces = [s for s in args.surfaces.split(",") if s]
    results, n_fail = [], 0
    t0 = time.perf_counter()
    for seed in range(args.seed_base, args.seed_base + args.seeds):
        r = run_seed(model, seed, surfaces)
        results.append(r)
        status = "FAIL " + json.dumps(r["fails"]) if r["fails"] else "ok"
        n_fail += bool(r["fails"])
        print(f"seed {seed:4d}: {r['samples']:6d} smp {r['tokens']:4d} tok  {status}",
              flush=True)
    summary = {"seeds": args.seeds, "failures": n_fail,
               "surfaces": surfaces,
               "wall_s": round(time.perf_counter() - t0, 1),
               "results": results}
    print(f"{args.seeds - n_fail}/{args.seeds} seeds token-exact across "
          f"{len(surfaces) + 1} surfaces ({summary['wall_s']}s)")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
