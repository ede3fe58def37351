"""Stream snapshot/restore: migrating a live stream to a fresh session must
be transcript-identical to never interrupting it (SURVEY §5 checkpoint
analog — the per-stream state a multi-stream server snapshots)."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import StreamingSession


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n=56000, seed=4):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * 320 * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def test_snapshot_restore_continuation(model):
    audio = _audio()
    rt = RuntimeConfig()
    cut = 24000  # mid-utterance, non-chunk-aligned

    # uninterrupted reference
    ref = StreamingSession(model, rt)
    for s in range(0, len(audio), 8000):
        ref.push_audio(audio[s : s + 8000])
    ref.finalize()
    want = ref.text

    # session A up to the cut, snapshot, restore into a FRESH session B
    a = StreamingSession(model, rt)
    for s in range(0, cut, 8000):
        a.push_audio(audio[s : s + 8000])
    snap = a.snapshot()
    assert snap["tokens"] is not a._tokens  # deep enough copy

    b = StreamingSession(model, rt)
    b.restore(snap)
    for s in range(cut, len(audio), 8000):
        b.push_audio(audio[s : s + 8000])
    b.finalize()
    assert b.text == want, f"{b.text!r} != {want!r}"

    # original session A, continued independently, also matches (snapshot
    # must not corrupt the source)
    for s in range(cut, len(audio), 8000):
        a.push_audio(audio[s : s + 8000])
    a.finalize()
    assert a.text == want


def test_snapshot_after_saturation(model):
    """Snapshot AFTER the ring cache wraps (cache_len == capacity)."""
    audio = _audio(120000, seed=7)  # long enough to saturate cache (32)
    rt = RuntimeConfig()
    ref = StreamingSession(model, rt)
    for s in range(0, len(audio), 16000):
        ref.push_audio(audio[s : s + 16000])
    ref.finalize()

    cut = 96000
    a = StreamingSession(model, rt)
    for s in range(0, cut, 16000):
        a.push_audio(audio[s : s + 16000])
    assert int(np.asarray(a._enc_state.cache_len)[0]) == model.cfg.att_cache_size
    snap = a.snapshot()
    b = StreamingSession(model, rt)
    b.restore(snap)
    for s in range(cut, len(audio), 16000):
        b.push_audio(audio[s : s + 16000])
    b.finalize()
    assert b.text == ref.text
