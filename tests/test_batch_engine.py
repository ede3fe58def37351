"""Multi-stream batch engine: per-stream results must match independent
single-stream sessions exactly (M5 hard part #3 — divergent streams in one
lockstep batch), including slot reuse and mid-stream attach."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine
from trt_asr_tpu.streaming.schedule import ChunkScheduler
from trt_asr_tpu.streaming.session import StreamingSession


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * (250 + 30 * seed) * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _single_stream_tokens(model, audio):
    sess = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    sess._sched = ChunkScheduler(model.cfg, unified=True)  # match engine profile
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
    sess.finalize()
    ev = None
    while (e := sess.poll_event()) is not None:
        ev = e
    return ev.tokens


def test_batch_matches_single_streams(model):
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=4, runtime=rt)
    audios = {0: _audio(40000, 1), 1: _audio(56000, 2), 2: _audio(24000, 3)}
    sids = {k: eng.open_stream() for k in audios}

    # interleaved pushes of different lengths
    offs = {k: 0 for k in audios}
    hop = {0: 8000, 1: 12000, 2: 5000}
    while any(offs[k] < len(a) for k, a in audios.items()):
        for k, a in audios.items():
            if offs[k] < len(a):
                eng.push_audio(sids[k], a[offs[k] : offs[k] + hop[k]])
                offs[k] += hop[k]
        eng.step()
    for k in audios:
        eng.finalize_stream(sids[k])
    eng.run_until_drained()

    for k, a in audios.items():
        want = _single_stream_tokens(model, a)
        got = None
        while (e := eng.poll_event(sids[k])) is not None:
            if e.type == 1:
                got = e.tokens
        assert got == want, f"stream {k}: {got} != {want}"


def test_slot_reuse_no_leak(model):
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    a = _audio(32000, 7)

    sid = eng.open_stream()
    eng.push_audio(sid, a)
    eng.finalize_stream(sid)
    eng.run_until_drained()
    t1 = eng.text(sid)
    eng.close_stream(sid)

    # reuse the slot with the same audio -> identical transcript
    sid2 = eng.open_stream()
    assert sid2 == sid
    eng.push_audio(sid2, a)
    eng.finalize_stream(sid2)
    eng.run_until_drained()
    assert eng.text(sid2) == t1


def test_slot_exhaustion(model):
    eng = BatchStreamingEngine(model, batch_size=2)
    eng.open_stream()
    eng.open_stream()
    with pytest.raises(RuntimeError, match="busy"):
        eng.open_stream()


def test_short_utterance_flush(model):
    """Sub-first-chunk utterance goes through the odd-flush path."""
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    sid = eng.open_stream()
    eng.push_audio(sid, _audio(4800, 9))  # 30 frames < 41
    eng.finalize_stream(sid)
    eng.run_until_drained()
    finals = []
    while (e := eng.poll_event(sid)) is not None:
        if e.type == 1:
            finals.append(e)
    assert len(finals) == 1
