"""Batched device beam in the batch engine (VERDICT r4 #3): every slot of
BatchStreamingEngine(beam=K) must be token-exact with a standalone
BeamStreamingSession(device=True) on the same audio — plain, with n-gram
LM fusion, and with biasing — including slot reuse and the nbest surface."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.decode.biasing import BiasingLM
from trt_asr_tpu.decode.ngram_lm import NGramLM
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine
from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
from trt_asr_tpu.streaming.schedule import ChunkScheduler


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * (250 + 30 * seed) * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _session_result(model, audio, **kw):
    """Reference: standalone device-beam session on the engine's unified
    chunk profile (the greedy batch tests' comparison pattern)."""
    sess = BeamStreamingSession(model, device=True, runtime=RuntimeConfig(),
                                **kw)
    sess._sched = ChunkScheduler(model.cfg, unified=True)
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s: s + 8000])
    sess.finalize()
    return sess._tokens, sess.nbest()


def _run_engine(eng, audios, sids):
    offs = {k: 0 for k in audios}
    hop = {0: 8000, 1: 12000, 2: 5000}
    while any(offs[k] < len(a) for k, a in audios.items()):
        for k, a in audios.items():
            if offs[k] < len(a):
                eng.push_audio(sids[k], a[offs[k]: offs[k] + hop[k]])
                offs[k] += hop[k]
        eng.step()
    for k in audios:
        eng.finalize_stream(sids[k])
    eng.run_until_drained()


def _assert_slots_match(model, eng, audios, sids, **session_kw):
    for k, a in audios.items():
        want_toks, want_nbest = _session_result(model, a, beam=eng.beam,
                                                **session_kw)
        got = None
        while (e := eng.poll_event(sids[k])) is not None:
            if e.type == 1:                      # FINAL_TEXT
                got = e.tokens
        assert got == want_toks, f"stream {k}: {got} != {want_toks}"
        got_nb = eng.nbest(sids[k])
        assert [ids for _, ids, _ in got_nb] == \
               [ids for _, ids, _ in want_nbest], k
        for (_, _, sg), (_, _, sw) in zip(got_nb, want_nbest):
            assert sg == pytest.approx(sw, abs=2e-3), k


def test_batch_beam_matches_single_sessions(model):
    eng = BatchStreamingEngine(model, batch_size=4, runtime=RuntimeConfig(),
                               beam=4)
    audios = {0: _audio(40000, 1), 1: _audio(56000, 2), 2: _audio(24000, 3)}
    sids = {k: eng.open_stream() for k in audios}
    _run_engine(eng, audios, sids)
    _assert_slots_match(model, eng, audios, sids)


def test_batch_beam_lm_fusion_matches_single_sessions(model):
    lm = NGramLM.fit(
        [np.random.default_rng(s).integers(
            0, model.cfg.token_head_size, size=10).tolist()
         for s in range(60)],
        order=3, vocab_size=model.cfg.token_head_size)
    eng = BatchStreamingEngine(model, batch_size=4, runtime=RuntimeConfig(),
                               beam=4, lm_fn=lm, lm_weight=0.5)
    audios = {0: _audio(40000, 4), 1: _audio(24000, 5), 2: _audio(32000, 6)}
    sids = {k: eng.open_stream() for k in audios}
    _run_engine(eng, audios, sids)
    _assert_slots_match(model, eng, audios, sids, lm_fn=lm, lm_weight=0.5)


def test_batch_beam_biasing_matches_single_sessions(model):
    r = np.random.default_rng(8)
    phrases = [tuple(r.integers(0, model.cfg.token_head_size,
                                size=r.integers(1, 3)).tolist())
               for _ in range(5)]
    cont = {}
    for p in phrases:
        for k in range(len(p)):
            cont.setdefault(p[:k], set()).add(p[k])
    bias = BiasingLM(cont, max(len(p) - 1 for p in phrases), 2.5,
                     model.cfg.token_head_size)
    eng = BatchStreamingEngine(model, batch_size=2, runtime=RuntimeConfig(),
                               beam=4, lm_fn=bias, lm_weight=1.0)
    audios = {0: _audio(24000, 9)}
    sids = {0: eng.open_stream()}
    _run_engine(eng, audios, sids)
    _assert_slots_match(model, eng, audios, sids, lm_fn=bias, lm_weight=1.0)


def test_batch_beam_slot_reuse(model):
    eng = BatchStreamingEngine(model, batch_size=2, runtime=RuntimeConfig(),
                               beam=4)
    a = _audio(32000, 7)
    sid = eng.open_stream()
    eng.push_audio(sid, a)
    eng.finalize_stream(sid)
    eng.run_until_drained()
    t1 = eng.text(sid)
    nb1 = [ids for _, ids, _ in eng.nbest(sid)]
    eng.close_stream(sid)

    sid2 = eng.open_stream()
    eng.push_audio(sid2, a)
    eng.finalize_stream(sid2)
    eng.run_until_drained()
    assert eng.text(sid2) == t1
    assert [ids for _, ids, _ in eng.nbest(sid2)] == nb1


def test_batch_beam_rejects_greedy_only_features(model):
    with pytest.raises(ValueError, match="beam > 1"):
        BatchStreamingEngine(model, beam=1, lm_fn=lambda p, t: 0.0)
    with pytest.raises(ValueError, match="NGramLM"):
        BatchStreamingEngine(model, beam=4, lm_fn=lambda p, t: 0.0)
