"""Continuous transcription (streaming/continuous.py): endpointing splits
an endless stream into segments; each segment is token-exact with a
dedicated session fed the same samples; push granularity does not matter;
works over both greedy and beam sessions; per_feature norm is rejected."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
from trt_asr_tpu.streaming.continuous import ContinuousTranscriber
from trt_asr_tpu.streaming.session import StreamingSession


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _speech(n, f, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * f * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _stream():
    """1s silence | 0.8s speech | 1s silence | 0.8s speech | 1s silence."""
    z = np.zeros(16000, np.float32)
    return np.concatenate([z, _speech(12800, 300, 0), z,
                           _speech(12800, 440, 1), z])


def _run(model, audio, chunk, session_cls=StreamingSession, **skw):
    sess = session_cls(model, runtime=RuntimeConfig(), **skw) \
        if session_cls is BeamStreamingSession \
        else session_cls(model, RuntimeConfig())
    ct = ContinuousTranscriber(sess)
    for s in range(0, len(audio), chunk):
        ct.push_audio(audio[s : s + chunk])
    ct.flush()
    return ct.segments


def test_segments_match_dedicated_sessions(model):
    audio = _stream()
    segs = _run(model, audio, 4000)
    assert len(segs) == 2, [s["text"] for s in segs]
    assert any(s["tokens"] for s in segs), "degenerate: no tokens at all"
    # boundaries bracket the true speech spans (1.0-1.8s and 2.8-3.6s),
    # including pre-roll before and the silence run after
    assert 0.7 <= segs[0]["start_s"] <= 1.02 and segs[0]["end_s"] >= 1.8
    assert 2.5 <= segs[1]["start_s"] <= 2.82 and segs[1]["end_s"] >= 3.6
    for seg in segs:
        a, b = int(round(seg["start_s"] * 16000)), int(round(seg["end_s"] * 16000))
        ref = StreamingSession(model, RuntimeConfig())
        ref.push_audio(audio[a:b])
        ref.finalize()
        assert seg["tokens"] == ref._tokens
        assert seg["text"] == ref.text


def test_push_granularity_invariance(model):
    audio = _stream()
    a = _run(model, audio, 1000)
    b = _run(model, audio, 7900)          # deliberately hop-misaligned
    c = _run(model, audio, len(audio))
    key = [(s["text"], s["start_s"], s["end_s"]) for s in a]
    assert key == [(s["text"], s["start_s"], s["end_s"]) for s in b]
    assert key == [(s["text"], s["start_s"], s["end_s"]) for s in c]


def test_beam_session_continuous(model):
    audio = _stream()
    segs = _run(model, audio, 4000, session_cls=BeamStreamingSession, beam=2)
    assert len(segs) == 2
    for seg in segs:
        a, b = int(round(seg["start_s"] * 16000)), int(round(seg["end_s"] * 16000))
        ref = BeamStreamingSession(model, beam=2, runtime=RuntimeConfig())
        ref.push_audio(audio[a:b])
        ref.finalize()
        assert seg["tokens"] == ref._tokens


def test_flush_midspeech_and_norm_rejection(model):
    audio = np.concatenate([np.zeros(16000, np.float32),
                            _speech(12800, 300, 0)])  # no trailing silence
    sess = StreamingSession(model, RuntimeConfig())
    ct = ContinuousTranscriber(sess)
    ct.push_audio(audio)
    assert ct.segments == []          # endpoint never fired
    assert ct.flush() == 1
    assert len(ct.segments) == 1 and ct.segments[0]["end_s"] > 1.0

    with pytest.raises(ValueError, match="per_feature"):
        ContinuousTranscriber(StreamingSession(
            model, RuntimeConfig(), feature_norm="per_feature",
            norm_stats=(np.zeros(model.cfg.feat_in, np.float32),
                        np.ones(model.cfg.feat_in, np.float32))))


def test_cli_continuous_flag(tmp_path):
    import io
    from contextlib import redirect_stdout

    from trt_asr_tpu.cli import main as cli_main

    pcm = tmp_path / "c.f32"
    _stream().astype("<f4").tofile(pcm)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main([str(pcm), "--raw-pcm", "--synthetic-model", "tiny",
                       "--continuous"])
    out = buf.getvalue()
    assert rc == 0
    segs = [l for l in out.splitlines() if l.startswith("Segment: ")]
    assert len(segs) == 2, out
    assert any(l.startswith("Transcript: ") for l in out.splitlines())


def test_preroll_holds_full_onset_debounce(model):
    """min_speech_s > preroll_s must not clip the debounced speech hops:
    the onset payload has to contain the whole onset run plus pre-roll
    (the ring is sized need_on + preroll)."""
    from trt_asr_tpu.streaming.continuous import HOP, EndpointDetector

    det = EndpointDetector(min_speech_s=0.5, preroll_s=0.1)
    audio = np.concatenate([np.zeros(16000, np.float32),
                            _speech(16000, 300, 0)])
    onsets = [p for k, p in det.feed(audio) if k == "onset"]
    assert len(onsets) == 1
    onset_audio, start = onsets[0]
    need_on = int(0.5 * 16000 / HOP)
    assert len(onset_audio) >= need_on * HOP
    # the onset run begins at 1.0s; start covers it plus pre-roll context
    assert start <= 16000 - int(0.1 * 16000) + HOP


def test_flush_end_matches_samples_fed(model):
    """A flushed (mid-speech) segment's end_s covers exactly the audio
    the session saw: a dedicated re-decode of [start_s, end_s) is
    token-exact, and end_s never exceeds the stream length."""
    audio = np.concatenate([np.zeros(16000, np.float32),
                            _speech(12800, 300, 0)])
    sess = StreamingSession(model, RuntimeConfig())
    ct = ContinuousTranscriber(sess)
    ct.push_audio(audio)
    assert ct.flush() == 1
    seg = ct.segments[0]
    assert seg["end_s"] <= len(audio) / 16000 + 1e-9
    a, b = int(round(seg["start_s"] * 16000)), int(round(seg["end_s"] * 16000))
    ref = StreamingSession(model, RuntimeConfig())
    ref.push_audio(audio[a:b])
    ref.finalize()
    assert seg["tokens"] == ref._tokens


def test_cli_continuous_subhop_stream_sim(tmp_path):
    """Regression: --stream-sim below one hop used to compute hop=0 and
    push empty slices (zero segments, silent success)."""
    import io
    from contextlib import redirect_stdout

    from trt_asr_tpu.cli import main as cli_main

    pcm = tmp_path / "s.f32"
    audio = np.concatenate([np.zeros(16000, np.float32),
                            _speech(12800, 300, 0),
                            np.zeros(16000, np.float32)])
    audio.astype("<f4").tofile(pcm)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main([str(pcm), "--raw-pcm", "--synthetic-model", "tiny",
                       "--continuous", "--stream-sim", "0.00005",
                       "--no-sleep"])
    out = buf.getvalue()
    assert rc == 0
    assert len([l for l in out.splitlines()
                if l.startswith("Segment: ")]) == 1, out
