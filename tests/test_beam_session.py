"""Streaming beam session (streaming/beam_session.py): beam=1 reproduces
the greedy StreamingSession transcript token-for-token across chunk
boundaries (the streaming-search anchor); the search is invariant to push
granularity; n-best is ranked/deduped; partials rewrite on beam re-ranking
(content-based change detection); LM fusion reaches the streaming path."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
from trt_asr_tpu.streaming.session import EventType, StreamingSession


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _drive(sess, audio, chunk):
    for s in range(0, len(audio), chunk):
        sess.push_audio(audio[s : s + chunk])
    sess.finalize()
    events = []
    while (ev := sess.poll_event()) is not None:
        events.append(ev)
    return events


def test_beam1_matches_greedy_session(model):
    """The killer anchor: the streaming beam at width 1 IS the greedy
    session (which is parity-tested against the torch oracle), including
    cross-chunk time carry and the finalize flush."""
    audio = _audio()
    greedy = StreamingSession(model, RuntimeConfig())
    _drive(greedy, audio, 8000)
    beam = BeamStreamingSession(model, beam=1, runtime=RuntimeConfig())
    _drive(beam, audio, 8000)
    assert greedy._tokens, "degenerate: greedy emitted nothing"
    assert beam._tokens == greedy._tokens
    assert beam.text == greedy.text


def test_push_granularity_invariance(model):
    """Same transcript AND same n-best scores regardless of how the audio
    is split across pushes (the beam state carries hypotheses over
    boundaries; waiting cursors resume exactly)."""
    audio = _audio()
    outs = []
    for chunk in (3200, 16000, len(audio)):
        sess = BeamStreamingSession(model, beam=3, expansion_k=3,
                                    runtime=RuntimeConfig())
        _drive(sess, audio, chunk)
        outs.append(sess.nbest())
    texts = [[t for t, _, _ in nb] for nb in outs]
    assert texts[0] == texts[1] == texts[2]
    scores = [np.array([s for _, _, s in nb]) for nb in outs]
    assert np.allclose(scores[0], scores[1], atol=1e-4)
    assert np.allclose(scores[0], scores[2], atol=1e-4)


def test_nbest_ranked_and_deduped(model):
    sess = BeamStreamingSession(model, beam=4, expansion_k=3,
                                runtime=RuntimeConfig())
    _drive(sess, _audio(), 8000)
    nb = sess.nbest()
    assert 1 <= len(nb) <= 4
    scores = [s for _, _, s in nb]
    assert scores == sorted(scores, reverse=True)
    assert len({tuple(ids) for _, ids, _ in nb}) == len(nb)
    # 1-best of nbest is the final transcript
    assert nb[0][1] == sess._tokens


def test_event_protocol_and_reset(model):
    audio = _audio()
    sess = BeamStreamingSession(
        model, beam=2, runtime=RuntimeConfig(partial_min_interval_ms=0))
    events = _drive(sess, audio, 8000)
    assert events[-1].type == EventType.FINAL_TEXT
    assert events[-1].tokens == sess._tokens
    assert any(e.type == EventType.PARTIAL_TEXT for e in events)
    t1 = sess.text
    sess.reset_utterance()
    events2 = _drive(sess, audio, 8000)
    assert sess.text == t1, "beam state leaked across reset"
    assert events2[-1].type == EventType.FINAL_TEXT


def test_lm_fusion_reaches_streaming(model):
    """Shallow fusion must reach the streaming path: an LM that charges
    every non-blank emission 10 nats makes blank-heavy paths dominate, so
    the fused 1-best must emit fewer tokens than the acoustic-only 1-best
    (same fusion rule as offline, decode/beam.py — blank is acoustic-only,
    emissions pay the LM)."""
    audio = _audio()
    base = BeamStreamingSession(model, beam=3, expansion_k=3,
                                runtime=RuntimeConfig())
    _drive(base, audio, 8000)
    assert base._tokens, "degenerate: acoustic-only beam emitted nothing"

    fused = BeamStreamingSession(model, beam=3, expansion_k=3,
                                 lm_fn=lambda prefix, tok: -10.0,
                                 lm_weight=1.0, runtime=RuntimeConfig())
    _drive(fused, audio, 8000)
    assert len(fused._tokens) < len(base._tokens)


def test_midstream_nbest_does_not_perturb_search(model):
    """Interim nbest() must be a pure read: calling it after every push
    cannot change the final result (beam_finish is non-mutating)."""
    audio = _audio()
    clean = BeamStreamingSession(model, beam=3, expansion_k=3,
                                 runtime=RuntimeConfig())
    _drive(clean, audio, 8000)
    probed = BeamStreamingSession(model, beam=3, expansion_k=3,
                                  runtime=RuntimeConfig())
    for s in range(0, len(audio), 8000):
        probed.push_audio(audio[s : s + 8000])
        probed.nbest()   # interim read
    probed.finalize()
    assert probed.nbest() == clean.nbest()


def test_beam1_timestamps_match_greedy(model):
    """The 1-best hypothesis carries emission stamps (frame, duration,
    log-softmax) — at beam=1 they must equal the greedy session's
    device-computed timestamps."""
    audio = _audio()
    greedy = StreamingSession(model, RuntimeConfig())
    _drive(greedy, audio, 8000)
    beam = BeamStreamingSession(model, beam=1, runtime=RuntimeConfig())
    _drive(beam, audio, 8000)
    tg, tb = greedy.token_timestamps(), beam.token_timestamps()
    assert len(tg) == len(tb) and tg, "no tokens emitted"
    for a, b in zip(tg, tb):
        assert a["token"] == b["token"]
        assert a["start_s"] == pytest.approx(b["start_s"], abs=1e-6)
        assert a["end_s"] == pytest.approx(b["end_s"], abs=1e-6)
        assert a["logp"] == pytest.approx(b["logp"], abs=2e-3)
    wg, wb = greedy.word_timestamps(), beam.word_timestamps()
    assert [w["word"] for w in wg] == [w["word"] for w in wb]


def test_cli_beam_flag(tmp_path):
    """--beam N reaches the CLI: NBest lines printed, Transcript == 1-best."""
    import io
    from contextlib import redirect_stdout

    from trt_asr_tpu.cli import main as cli_main

    pcm = tmp_path / "a.f32"
    _audio(24000).astype("<f4").tofile(pcm)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main([str(pcm), "--raw-pcm", "--synthetic-model", "tiny",
                       "--beam", "2", "--feature-norm", "none"])
    out = buf.getvalue()
    assert rc == 0
    nbest = [l for l in out.splitlines() if l.startswith("NBest: ")]
    assert nbest, out
    transcript = [l for l in out.splitlines() if l.startswith("Transcript: ")][0]
    top_text = nbest[0].split(" ", 2)[2] if nbest[0].count(" ") >= 2 else ""
    assert transcript.split("Transcript: ", 1)[1] == top_text


def test_snapshot_unsupported(model):
    sess = BeamStreamingSession(model, beam=2, runtime=RuntimeConfig())
    with pytest.raises(NotImplementedError):
        sess.snapshot()


def test_bridge_beam_env_dispatch(tmp_path, monkeypatch):
    """TRT_ASR_BEAM selects the beam session in the C-ABI bridge (the
    in-process half of the native surface, runtime/capi_bridge.py)."""
    from trt_asr_tpu.runtime import capi_bridge

    mdir = tmp_path / "m"
    m = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    m.save_model_dir(str(mdir))
    monkeypatch.setenv("TRT_ASR_BEAM", "2")
    s = capi_bridge.create_session(str(mdir))
    assert isinstance(s.session, BeamStreamingSession)
    feats = np.random.default_rng(0).standard_normal(
        (120, m.cfg.feat_in)).astype(np.float32)
    capi_bridge.push_features(s, feats.tobytes(), 120)
    capi_bridge.finalize(s)
    types = []
    while (ev := capi_bridge.poll_event(s)) is not None:
        types.append(ev[0])
    assert 1 in types  # FinalText delivered through the bridge protocol
    monkeypatch.delenv("TRT_ASR_BEAM")
    s2 = capi_bridge.create_session(str(mdir))
    from trt_asr_tpu.streaming.session import StreamingSession as _SS
    assert type(s2.session) is _SS


def test_stable_prefix_semantics(model):
    """stable_text is monotone (each snapshot extends the previous one),
    is a prefix of every active hypothesis when captured, and the final
    transcript extends the last mid-stream snapshot. Greedy sessions
    report their whole (never-rewritten) transcript as stable."""
    from trt_asr_tpu.decode.beam import beam_stable_prefix

    audio = _audio()
    sess = BeamStreamingSession(model, beam=3, expansion_k=3,
                                runtime=RuntimeConfig())
    stables, prefixes = [], []
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
        p = beam_stable_prefix(sess._beam_state)
        prefixes.append(p)
        stables.append(sess.stable_text)
        for h in sess._beam_state.active:
            assert h.tokens[: len(p)] == p
    sess.finalize()
    for a, b in zip(prefixes, prefixes[1:]):
        assert b[: len(a)] == a, "stable prefix regressed mid-stream"
    assert sess._tokens[: len(prefixes[-1])] == prefixes[-1]
    assert sess.stable_text == sess.text  # finalized: all committed

    greedy = StreamingSession(model, RuntimeConfig())
    greedy.push_audio(audio)
    assert greedy.stable_text == greedy.text


def test_no_spurious_empty_partial(model):
    """Regression: before any token is decoded the beam session must emit
    NO partial (the initial no-tokens state compares equal to an empty
    decode; a None sentinel made '() != None' fire an empty PARTIAL)."""
    sess = BeamStreamingSession(
        model, beam=2, runtime=RuntimeConfig(partial_min_interval_ms=0))
    sess.push_audio(np.zeros(1600, np.float32))   # less than one chunk
    evs = []
    while (ev := sess.poll_event()) is not None:
        evs.append(ev)
    assert not any(e.type == EventType.PARTIAL_TEXT for e in evs), evs
