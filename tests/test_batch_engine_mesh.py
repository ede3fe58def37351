"""Mesh-aware serving: BatchStreamingEngine(mesh=...) must be token-exact
vs the unsharded engine (VERDICT r2 weak #5 / next-round #2). The engine —
not just the jitted `_batch_step` — is the multi-chip product surface:
params laid out by shard_params, slot state sharded over dp, every feed
placed per step. Runs on the 8-virtual-CPU-device mesh (conftest), with
mid-flight attach and staggered finalize/flush exercising row resets and
keep-all flush under GSPMD.
"""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.parallel import make_mesh
from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * (250 + 30 * seed) * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _drive(eng, audios):
    """Interleaved pushes, a mid-flight attach after 2 steps, staggered
    finalize: stream 0 flushes while 1/2/late are still steady-chunking."""
    sids = {k: eng.open_stream() for k in list(audios)[:3]}
    late_key = list(audios)[3]
    offs = {k: 0 for k in sids}
    hop = {list(audios)[0]: 8000, list(audios)[1]: 12000, list(audios)[2]: 5000}
    steps = 0
    finalized = set()
    while True:
        for k, sid in sids.items():
            a = audios[k]
            if offs[k] < len(a):
                eng.push_audio(sid, a[offs[k]: offs[k] + hop.get(k, 7000)])
                offs[k] += hop.get(k, 7000)
            elif k not in finalized:
                eng.finalize_stream(sid)
                finalized.add(k)
        eng.step()
        steps += 1
        if steps == 2:  # mid-flight attach on a fresh slot
            sids[late_key] = eng.open_stream()
            offs[late_key] = 0
        if finalized == set(sids) and eng.pending() == 0:
            break
        if steps > 200:
            raise AssertionError("drive did not drain")
    eng.run_until_drained()
    out = {}
    for k, sid in sids.items():
        toks = None
        while (e := eng.poll_event(sid)) is not None:
            if e.type == 1:  # FINAL_TEXT
                toks = e.tokens
        out[k] = (toks, eng.text(sid))
    return out


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_engine_mesh_token_exact(model, dp, tp):
    rt = RuntimeConfig(suppress_leading_punct=False)
    audios = {"a": _audio(40000, 1), "b": _audio(56000, 2),
              "c": _audio(24000, 3), "late": _audio(30000, 4)}

    ref = _drive(BatchStreamingEngine(model, batch_size=8, runtime=rt), audios)
    mesh = make_mesh(dp=dp, tp=tp)
    got = _drive(BatchStreamingEngine(model, batch_size=8, runtime=rt,
                                      mesh=mesh), audios)

    for k in audios:
        assert got[k] == ref[k], f"stream {k}: {got[k]} != {ref[k]}"


def test_engine_mesh_rejects_indivisible_batch(model):
    mesh = make_mesh(dp=8, tp=1)
    with pytest.raises(ValueError, match="divide"):
        BatchStreamingEngine(model, batch_size=6, mesh=mesh)


def test_engine_mesh_state_actually_sharded(model):
    """The serving state must really live sharded over dp — not replicated:
    assert the encoder att_cache's sharding partitions the batch axis."""
    mesh = make_mesh(dp=8, tp=1)
    eng = BatchStreamingEngine(model, batch_size=8, mesh=mesh)
    sh = eng._enc_state.att_cache.sharding
    spec = sh.spec
    assert spec[1] == "dp", f"batch axis not dp-sharded: {spec}"
    assert eng._dec_state.g.sharding.spec[0] == "dp"
