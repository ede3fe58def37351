#!/usr/bin/env python3
"""Offline engine build CLI — the reference's TRT engine builder analog
(/root/reference/tools/build_trt/build_trt.py:91-165: ONNX -> serialized
engines with shape profiles, per-engine smoke run, build_report.json; and
scripts/inspect_engine.py: deserialize + print bindings).

Build every device program a streaming session executes into serialized
StableHLO engine artifacts + manifest:

    python tools/engine_build.py --model-dir artifacts/models/gate_r3 \
        --outdir /tmp/engines --cache-dir /tmp/xla_cache

Precision/kernel selection comes from the same runtime knobs the server
uses (TRT_ASR_COMPUTE_DTYPE, TRT_ASR_QUANT, TRT_ASR_PALLAS_*,
TRT_ASR_F32_PRECISION ...) — the builder-precision analog of trtexec
--fp16. Inspect an engine directory (manifest + per-engine IO avals):

    python tools/engine_build.py --inspect /tmp/engines
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def inspect(engine_dir: str) -> int:
    from trt_asr_tpu.runtime.engine import EngineSet

    with open(os.path.join(engine_dir, "manifest.json")) as f:
        manifest = json.load(f)
    b = manifest["build"]
    print(f"build: jax {b['jax']} | platform {b['platform']} "
          f"({b['device_kind']}) | {b['num_programs']} programs")
    es = EngineSet.load(engine_dir)  # verifies per-file sha256
    print(f"loaded + sha256-verified {len(es)} engines")
    for name, e in manifest["engines"].items():
        print(f"\n[{name}] {e['file']}  {e['bytes']} bytes  key={e['key']}")
        print(f"  feats {e['feats_shape']}  statics "
              + " ".join(f"{k}={v}" for k, v in sorted(e["statics"].items())
                         if k not in ("cfg",)))
        print(f"  inputs:  {len(e['in_avals'])} tensors")
        print(f"  outputs: {len(e['out_avals'])} tensors: "
              + ", ".join(e["out_avals"][:4])
              + (" ..." if len(e["out_avals"]) > 4 else ""))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", help="ParakeetTDT model dir (config.json + params)")
    ap.add_argument("--config", default="tiny", choices=["tiny", "full"],
                    help="random-weights config when no --model-dir")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--outdir", help="engine output directory")
    ap.add_argument("--cache-dir", default="",
                    help="also populate this XLA persistent compilation cache")
    ap.add_argument("--batch", default="",
                    help="comma-separated batch sizes: additionally build "
                         "the lockstep multi-stream program per size (the "
                         "serving daemon's engine; serve.py --engines)")
    ap.add_argument("--no-smoke", action="store_true",
                    help="skip the per-engine deserialize+run smoke test")
    ap.add_argument("--platform", default="env", choices=["cpu", "tpu", "env"])
    ap.add_argument("--inspect", metavar="DIR",
                    help="inspect an existing engine dir instead of building")
    args = ap.parse_args()

    if args.inspect:
        return inspect(args.inspect)
    if not args.outdir:
        ap.error("--outdir is required to build")

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.runtime.engine import apply_compile_cache, build_engines

    if args.cache_dir:
        apply_compile_cache(args.cache_dir)
    t0 = time.perf_counter()
    if args.model_dir:
        model = ParakeetTDT.from_model_dir(args.model_dir)
    else:
        cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
        model = ParakeetTDT.random(cfg, seed=args.seed)
    batch_sizes = tuple(int(x) for x in args.batch.split(",") if x)
    manifest = build_engines(model, args.outdir, smoke=not args.no_smoke,
                             batch_sizes=batch_sizes)
    if args.cache_dir:
        # one warm execution of EVERY built live-jit program (all four
        # session shapes incl. both flushes, plus each --batch lockstep
        # program) populates the persistent cache alongside the serialized
        # artifacts: a fresh server process with TRT_ASR_COMPILE_CACHE
        # pointed here starts compile-free (the TRT load-.engine analog)
        import jax

        from trt_asr_tpu.runtime.engine import (
            _fresh_like,
            batch_program_specs,
            session_program_specs,
        )

        specs = session_program_specs(model)
        for b in batch_sizes:
            specs += batch_program_specs(model, b)
        for sp in specs:
            a = tuple(v if i == 1 else _fresh_like(v)
                      for i, v in enumerate(sp.args))
            jax.block_until_ready(sp.resolve_fn()(*a, **sp.kwargs))
        n_cached = len(os.listdir(args.cache_dir))
        manifest["build"]["compile_cache"] = {
            "dir": args.cache_dir, "entries": n_cached,
            "warmed_programs": [sp.name for sp in specs]}
        with open(os.path.join(args.outdir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=1)
    wall = time.perf_counter() - t0
    total = sum(e["bytes"] for e in manifest["engines"].values())
    print(f"built {len(manifest['engines'])} engines "
          f"({total} bytes) in {wall:.1f}s -> {args.outdir}")
    for name, e in manifest["engines"].items():
        smoke = e.get("smoke", {}).get("ok", "skipped")
        print(f"  {name:8s} {e['bytes']:8d} B  export {e['export_s']:6.2f}s  "
              f"smoke={smoke}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
