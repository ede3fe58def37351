"""AOT engine build/load/serve (runtime/engine.py) — the reference's TRT
engine-build + load-and-execute path (tools/build_trt/build_trt.py,
cpp/src/parakeet_trt.cpp:1720-1738) rebuilt as jax.export StableHLO
artifacts + the XLA persistent compilation cache."""

import json
import os

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.runtime.engine import (
    EngineSet,
    apply_compile_cache,
    build_engines,
    program_key,
    session_program_specs,
)
from trt_asr_tpu.streaming.session import StreamingSession, _session_step


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=0)


@pytest.fixture(scope="module")
def engine_dir(model, tmp_path_factory):
    d = tmp_path_factory.mktemp("engines")
    build_engines(model, str(d), smoke=False)
    return str(d)


def test_build_manifest(model, engine_dir):
    with open(os.path.join(engine_dir, "manifest.json")) as f:
        manifest = json.load(f)
    # the greedy session's program set: chunk-0, steady, both flush shapes
    assert set(manifest["engines"]) == {"chunk0", "steady", "flush0", "flush"}
    for name, e in manifest["engines"].items():
        assert os.path.getsize(os.path.join(engine_dir, e["file"])) == e["bytes"]
        assert e["in_avals"] and e["out_avals"]
        assert e["statics"]["with_timestamps"] is True
    # shape profiles: first chunk 41 frames, steady 57 (tiny keeps contract
    # geometry); flushes share shapes but differ in cache_drop/valid_cap
    eng = manifest["engines"]
    assert eng["chunk0"]["feats_shape"][1] == model.cfg.chunk_size_frames[0]
    assert eng["steady"]["feats_shape"][1] == (model.cfg.chunk_size_frames[1]
                                               + model.cfg.pre_encode_cache_size[1])
    assert eng["flush"]["statics"]["cache_drop"] == 0
    assert eng["steady"]["statics"]["cache_drop"] == model.cfg.cache_drop_size
    # four distinct program signatures
    assert len({e["key"] for e in eng.values()}) == 4


def test_engine_exec_matches_live_jit(model, engine_dir):
    """Deserialized steady-chunk engine == live jit, output-exact (the
    engine is the same program, serialized)."""
    es = EngineSet.load(engine_dir)
    [steady] = [s for s in session_program_specs(model) if s.name == "steady"]
    rng = np.random.default_rng(3)
    feats = (0.5 * rng.standard_normal(steady.args[2].shape)).astype(np.float32)
    args = steady.args[:2] + (feats,) + steady.args[3:]

    # numpy copies so the donated state buffers don't alias across the two
    # calls (cfg at index 1 is the static config, not an array pytree)
    def copy_args(a):
        return tuple(v if i == 1 else jax_to_np(v) for i, v in enumerate(a))

    args_np = copy_args(args)
    live = _session_step(*args_np, **steady.kwargs)
    prog = es.get(program_key(args_np, steady.kwargs))
    assert prog is not None
    eng = es.call(prog, copy_args(args), steady.kwargs)
    # (tokens, n, enc_state, dec_state, stamps, t_out)
    np.testing.assert_array_equal(np.asarray(live[0]), np.asarray(eng[0]))
    assert int(live[1]) == int(eng[1])
    for a, b in zip(live[2], eng[2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(live[3], eng[3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def jax_to_np(tree):
    import jax

    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def test_session_serves_from_engines(model, engine_dir):
    es = EngineSet.load(engine_dir)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    live = StreamingSession(model)
    live.push_audio(audio)
    live.finalize()
    served = StreamingSession(model, engines=es)
    served.push_audio(audio)
    served.finalize()
    assert served._tokens == live._tokens
    assert served.engine_misses == 0
    assert served.engine_hits == len(served.chunk_latencies_ms)
    assert served.engine_hits > 2  # chunk0 + steady chunks + flush


def test_corrupt_engine_rejected(model, engine_dir, tmp_path):
    import shutil

    bad = tmp_path / "bad_engines"
    shutil.copytree(engine_dir, bad)
    p = bad / "steady.shlo"
    data = bytearray(p.read_bytes())
    data[len(data) // 2] ^= 0xFF
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="sha256 mismatch"):
        EngineSet.load(str(bad))


def test_compile_cache_populates(tmp_path):
    """Hermetic by subprocess: enabling the persistent cache is a
    process-global jax config change, and cache WRITES during later tests'
    compiles have segfaulted this jax build's zstd path mid-suite — the
    cache must never be live in the suite process."""
    import subprocess
    import sys

    repo = __file__.rsplit("/tests/", 1)[0]
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import jax.numpy as jnp, os, sys\n"
        "from trt_asr_tpu.runtime.engine import apply_compile_cache\n"
        f"apply_compile_cache({str(tmp_path)!r})\n"
        "jax.jit(lambda x: (x @ x).sum() * 3.0)(jnp.ones((32, 32)))"
        ".block_until_ready()\n"
        f"sys.exit(0 if os.listdir({str(tmp_path)!r}) else 1)\n")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=300,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": repo})
    assert r.returncode == 0, r.stderr[-500:]
    assert len(os.listdir(tmp_path)) > 0


def test_program_key_separates_signatures(model):
    specs = session_program_specs(model)
    keys = {s.key for s in specs}
    assert len(keys) == len(specs) == 4
    # key is signature-only: changing traced VALUES must not change the key
    [steady] = [s for s in specs if s.name == "steady"]
    args2 = (steady.args[:2]
             + (np.ones_like(np.asarray(steady.args[2])),)
             + steady.args[3:])
    assert program_key(args2, steady.kwargs) == steady.key


def test_batch_engine_serves_from_engines(model, tmp_path):
    """--batch engines: the lockstep multi-stream program served from its
    deserialized artifact must be token-exact with the live-jit engine,
    every step an engine hit."""
    from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine

    d = tmp_path / "beng"
    build_engines(model, str(d), smoke=False, batch_sizes=(2,))
    with open(d / "manifest.json") as f:
        names = set(json.load(f)["engines"])
    assert "batch2" in names and "steady" in names
    es = EngineSet.load(str(d))

    rng = np.random.default_rng(5)
    audios = {0: (0.1 * rng.standard_normal(32000)).astype(np.float32),
              1: (0.1 * rng.standard_normal(24000)).astype(np.float32)}

    def run(engines):
        eng = BatchStreamingEngine(model, batch_size=2, engines=engines)
        sids = {k: eng.open_stream() for k in audios}
        for k, a in audios.items():
            eng.push_audio(sids[k], a)
            eng.finalize_stream(sids[k])
        eng.run_until_drained()
        return {k: list(eng._tokens[sids[k]]) for k in audios}, eng

    live, _ = run(None)
    served, eng = run(es)
    assert served == live
    assert eng.engine_misses == 0 and eng.engine_hits > 0
