"""AOT engine build & serve — the TPU-native analog of the reference's
TensorRT engine-build step.

Reference parity role: the reference compiles its ONNX components into
serialized ``.engine`` files once, offline (tools/build_trt/build_trt.py:91-165),
with fixed shape profiles per component (tools/build_trt/profiles.py:10-111),
a per-engine smoke run at opt shapes (build_trt.py:333-418) and a
``build_report.json``; the C++ runtime then deserializes them at session
create with no compile cost (cpp/src/parakeet_trt.cpp:1720-1738).

This repo has no graph compiler — the architecture is the code — but XLA
has the same two-phase structure: trace+compile once, execute many. This
module makes the compile phase explicit, offline, and persistent:

- :func:`session_program_specs` enumerates every device-program signature a
  greedy :class:`StreamingSession` executes — the shape-profile analog.
  There are exactly four: chunk-0 (41 frames), steady chunk (57), and the
  finalize flush at both geometries (cache_drop=0, uncapped valid length).
  Signatures come from the session's own ``_step_kwargs`` so engines can
  never drift from the serving call.
- :func:`build_engines` AOT-exports each program as a portable serialized
  StableHLO artifact (``jax.export``) with a ``manifest.json`` recording
  input/output avals, static flags, per-file sha256 and sizes — the
  ``build_report.json`` analog — and optionally smoke-runs every
  deserialized engine.
- :class:`EngineSet` loads the artifacts; ``StreamingSession(engines=...)``
  serves chunks through them (signature-keyed lookup with live-jit
  fallback) — the load-.engine-and-execute path.
- :func:`apply_compile_cache` enables XLA's persistent compilation cache so
  a fresh process reuses compiled binaries instead of recompiling — the
  cold-start story (TRT loads engines in ~1 s; an uncached trace+compile
  of the fused chunk step costs tens of seconds on TPU).

Which to use: the persistent cache is the PRODUCTION cold-start path —
the live jit keeps buffer donation, so per-step cost is unchanged. The
serialized artifacts are the portability/audit path (executable outside
this codebase's Python, sha256-pinned, inspectable): jax.export's .call
re-stages without donation — ~4x per-step at tiny/CPU scale where host
costs dominate, but 0.98x (noise) at FULL size on the real chip
(tools/perf/engine_overhead_tpu.py, artifacts/perf/engine_overhead_tpu.json),
so at production scale both paths are equivalent per step. Both are
token-exact with the live path.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax


def _static_names(fn=None) -> frozenset:
    """A jitted program's static argnames, introspected from its own jit
    decoration (so this module can never disagree with the serving
    program); defaults to the session chunk step. Literal fallback if the
    private attribute moves across jax versions."""
    if fn is None:
        from trt_asr_tpu.streaming.session import _session_step as fn

    try:
        return frozenset(fn._jit_info.static_argnames)
    except AttributeError:
        return frozenset(
            ("cfg", "drop_extra", "cache_drop", "valid_cap", "blank_penalty",
             "use_punct_mask", "use_pallas_joint", "trace", "pad_steps",
             "use_pallas_att", "use_pallas_conv", "use_pallas_ffn",
             "use_batched_decode", "with_timestamps", "max_tokens"))


def _norm(v: Any) -> Any:
    """Canonical JSON-able form of one step arg: statics by value, arrays
    by (treedef, shapes, dtypes) — the program signature, not the data."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return json.loads(json.dumps(dataclasses.asdict(v), default=list))
    leaves, treedef = jax.tree_util.tree_flatten(v)
    return [str(treedef),
            [[list(np.shape(l)), str(np.asarray(l).dtype) if not hasattr(l, "dtype")
              else str(l.dtype)] for l in leaves]]


def program_key(args: Tuple, kwargs: Dict[str, Any]) -> str:
    """Deterministic signature key for one (args, kwargs) invocation of the
    fused chunk program: shapes/dtypes of traced args + values of statics."""
    payload = json.dumps([[_norm(a) for a in args],
                          {k: _norm(v) for k, v in sorted(kwargs.items())}],
                         sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class ProgramSpec:
    """One buildable program: a name, the jitted fn, the exact invocation."""

    name: str
    args: Tuple
    kwargs: Dict[str, Any]
    fn: Any = None          # jitted callable; None = session._session_step

    @property
    def key(self) -> str:
        return program_key(self.args, self.kwargs)

    def resolve_fn(self):
        if self.fn is not None:
            return self.fn
        from trt_asr_tpu.streaming.session import _session_step

        return _session_step


def session_program_specs(model, runtime=None) -> List[ProgramSpec]:
    """Enumerate the greedy session's program set (the reference's shape
    profiles: encoder T 16/64/256 etc., profiles.py:28-111 — here the four
    chunk geometries x decode variants the session actually runs)."""
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state
    from trt_asr_tpu.models.parakeet.encoder import init_encoder_state
    from trt_asr_tpu.streaming.schedule import ChunkScheduler
    from trt_asr_tpu.streaming.session import StreamingSession

    sess = StreamingSession(model, runtime)
    cfg = model.cfg
    first_chunk = cfg.chunk_size_frames[0]

    sch = ChunkScheduler(cfg)
    chunk0 = sch.next_ready(first_chunk)
    steady = sch.peek(1 << 30)
    f0 = ChunkScheduler(cfg).flush(max(first_chunk - 1, 1))
    sch2 = ChunkScheduler(cfg)
    sch2.next_ready(first_chunk)
    flush = sch2.flush(first_chunk + 1)

    specs: List[ProgramSpec] = []
    for name, spec, is_last in (("chunk0", chunk0, False),
                                ("steady", steady, False),
                                ("flush0", f0, True),
                                ("flush", flush, True)):
        if spec is None:
            continue
        # fresh per-program states: the step donates enc/dec state buffers,
        # so no two specs may alias the same arrays
        sess._enc_state = init_encoder_state(cfg, 1)
        sess._dec_state = prime_decode_state(
            model.params, cfg, init_decode_state(cfg, 1), model.prompt_ids)
        sess._feat_buf = np.zeros((max(spec.slice_end, spec.frames), cfg.feat_in),
                                  np.float32)
        args, kwargs = sess._step_kwargs(spec, is_last)
        specs.append(ProgramSpec(name, args, kwargs))
    return specs


def batch_program_specs(model, batch_size: int, runtime=None) -> List[ProgramSpec]:
    """The lockstep multi-stream program set: ONE program per batch size —
    steady and final-flush chunks share it via per-row vectors
    (streaming/batch_engine.py _batch_step), so the whole serving daemon is
    a single engine artifact."""
    from trt_asr_tpu.streaming.batch_engine import (
        BatchStreamingEngine,
        _batch_step,
    )

    eng = BatchStreamingEngine(model, batch_size=batch_size, runtime=runtime)
    cfg = model.cfg
    b = eng.b
    args = (eng._params, cfg,
            np.zeros((b, eng._frames, cfg.feat_in), np.float32),
            np.zeros((b,), np.int32),
            eng._enc_state, eng._dec_state,
            np.zeros((b,), np.int32),
            np.full((b,), cfg.cache_drop_size, np.int32),
            np.full((b,), cfg.valid_out_len, np.int32))
    return [ProgramSpec(f"batch{b}", args, eng._step_call_kwargs(),
                        fn=_batch_step)]


def _call_arrays(spec_args: Tuple, spec_kwargs: Dict[str, Any],
                 statics: Optional[frozenset] = None):
    """Strip statics from an invocation, leaving the array pytree an
    exported program's .call expects (cfg is positional index 1 in every
    serving program)."""
    statics = _static_names() if statics is None else statics
    call_args = tuple(a for i, a in enumerate(spec_args) if i != 1)
    call_kwargs = {k: v for k, v in spec_kwargs.items() if k not in statics}
    return call_args, call_kwargs


def _fresh_like(tree):
    """Zero-filled arrays matching a pytree's avals (smoke-run inputs;
    donated buffers must not alias the build inputs)."""
    return jax.tree_util.tree_map(
        lambda a: np.zeros(np.shape(a), np.asarray(a).dtype
                           if not hasattr(a, "dtype") else a.dtype), tree)


_REGISTERED = False


def _register_state_serialization() -> None:
    """jax.export needs the custom pytree node types appearing in the step
    signature (the state namedtuples) registered for serialization; one-time."""
    global _REGISTERED
    if _REGISTERED:
        return
    from jax import export as jexport

    from trt_asr_tpu.decode.tdt_greedy import DecodeState
    from trt_asr_tpu.models.parakeet.encoder import EncoderState

    for t in (EncoderState, DecodeState):
        jexport.register_namedtuple_serialization(
            t, serialized_name=f"trt_asr_tpu.{t.__name__}")
    _REGISTERED = True


def build_engines(model, outdir: str, runtime=None, smoke: bool = True,
                  batch_sizes: Tuple[int, ...] = ()) -> Dict:
    """AOT-export every session program (plus one lockstep multi-stream
    program per requested batch size) into ``outdir``; returns (and writes)
    the manifest — the reference build_report.json analog."""
    from jax import export as jexport

    _register_state_serialization()

    os.makedirs(outdir, exist_ok=True)
    specs = session_program_specs(model, runtime)
    for b in batch_sizes:
        specs += batch_program_specs(model, b, runtime)
    dev = jax.devices()[0]
    # the precision/quant knobs baked into the exported StableHLO do NOT
    # change shapes/dtypes, so a server running different knobs would
    # silently execute the builder's numerics with no audit trail (ADVICE
    # r3) — record them like trtexec records builder flags, and warn on
    # mismatch at EngineSet.load
    from trt_asr_tpu.ops import common as _ops_common

    rt_cfg = runtime if runtime is not None else getattr(model, "runtime", None)
    manifest: Dict[str, Any] = {
        "format": "jax.export serialized StableHLO",
        "build": {
            "jax": jax.__version__,
            "platform": dev.platform,
            "device_kind": getattr(dev, "device_kind", str(dev)),
            "num_programs": len(specs),
            "f32_precision": next(
                k for k, v in _ops_common._PRECISION_MODES.items()
                if v is _ops_common._F32_PRECISION),
            "compute_dtype": getattr(rt_cfg, "compute_dtype", None),
            "decode_dtype": getattr(rt_cfg, "decode_dtype", None),
            "quant": getattr(rt_cfg, "quant", None),
        },
        "engines": {},
    }
    for sp in specs:
        t0 = time.perf_counter()
        fn = sp.resolve_fn()
        statics = _static_names(fn)
        exp = jexport.export(fn)(*sp.args, **sp.kwargs)
        data = exp.serialize()
        fname = f"{sp.name}.shlo"
        with open(os.path.join(outdir, fname), "wb") as f:
            f.write(data)
        entry = {
            "file": fname,
            "key": sp.key,
            "bytes": len(data),
            "sha256": hashlib.sha256(data).hexdigest(),
            "export_s": round(time.perf_counter() - t0, 3),
            "platforms": list(exp.platforms),
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
            "static_names": sorted(statics),
            "statics": {k: (v if isinstance(v, (bool, int, float, str, type(None)))
                            else str(v))
                        for k, v in sp.kwargs.items() if k in statics},
            "feats_shape": list(np.shape(sp.args[2])),
        }
        if smoke:
            t1 = time.perf_counter()
            prog = jexport.deserialize(data)
            ca, ck = _call_arrays(sp.args, sp.kwargs, statics)
            out = prog.call(*_fresh_like(ca), **_fresh_like(ck))
            jax.block_until_ready(out)
            entry["smoke"] = {"ok": True,
                              "wall_s": round(time.perf_counter() - t1, 3)}
        manifest["engines"][sp.name] = entry
    with open(os.path.join(outdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class EngineSet:
    """Deserialized AOT engines, keyed by program signature. The session
    looks programs up per chunk and falls back to the live jit on miss."""

    def __init__(self, programs: Dict[str, Any], manifest: Dict):
        self._programs = programs   # key -> (exported program, statics)
        self.manifest = manifest

    @classmethod
    def load(cls, engine_dir: str) -> "EngineSet":
        from jax import export as jexport

        _register_state_serialization()
        with open(os.path.join(engine_dir, "manifest.json")) as f:
            manifest = json.load(f)
        # precision audit: the engines bake the BUILDER's numerics; a
        # different TRT_ASR_F32_PRECISION in this process would otherwise
        # silently serve the builder's precision with no trace (ADVICE r3)
        built_prec = manifest.get("build", {}).get("f32_precision")
        if built_prec:
            from trt_asr_tpu.ops import common as _ops_common

            cur = next(k for k, v in _ops_common._PRECISION_MODES.items()
                       if v is _ops_common._F32_PRECISION)
            if cur != built_prec:
                import warnings

                warnings.warn(
                    f"engine set was built with f32_precision={built_prec} "
                    f"but this process runs {cur}; engine calls execute the "
                    f"BUILDER's precision", stacklevel=2)
        programs = {}
        for name, entry in manifest["engines"].items():
            path = os.path.join(engine_dir, entry["file"])
            with open(path, "rb") as f:
                data = f.read()
            sha = hashlib.sha256(data).hexdigest()
            if sha != entry["sha256"]:
                raise ValueError(
                    f"engine {name}: sha256 mismatch (manifest "
                    f"{entry['sha256'][:12]}.., file {sha[:12]}..) — "
                    f"corrupt or tampered artifact")
            statics = (frozenset(entry["static_names"])
                       if "static_names" in entry else None)
            programs[entry["key"]] = (jexport.deserialize(data), statics)
        return cls(programs, manifest)

    def get(self, key: str):
        return self._programs.get(key)

    def call(self, prog, args: Tuple, kwargs: Dict[str, Any]):
        exported, statics = prog
        ca, ck = _call_arrays(args, kwargs, statics)
        return exported.call(*ca, **ck)

    def __len__(self) -> int:
        return len(self._programs)


def apply_compile_cache(cache_dir: str) -> None:
    """Point XLA's persistent compilation cache at ``cache_dir`` (idempotent).
    Any jit compile after this call is written to / fetched from disk, so a
    fresh process serving the same programs skips compilation — the
    TRT-engine cold-start story. Wired to ``TRT_ASR_COMPILE_CACHE``
    (RuntimeConfig.compile_cache_dir); applied at model construction.

    ONE-WAY per process: jax memoizes the cache backend on first use, so
    resetting jax_compilation_cache_dir afterwards does NOT stop writes
    (measured: compiles keep calling put_executable_and_time with the dir
    restored to None — and if the dir has been deleted, the write path can
    segfault). Enable it only in processes that keep it for their lifetime;
    tests exercise it in a subprocess (tests/test_engine.py)."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
