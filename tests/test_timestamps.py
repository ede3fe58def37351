"""Frame-anchored token/word timestamps (capability beyond the reference:
its event protocol carries text only — parakeet_trt.cpp:680-690).

Invariants:
- device decode stamps == host reference decode stamps (single + batched)
- chunked decode with carried state reproduces whole-utterance absolute frames
- session timestamps are push-granularity invariant and survive
  snapshot/restore
- batch engine timestamps == single-stream session timestamps
- word grouping follows SentencePiece boundaries with punctuation attached
"""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.decode import (
    init_decode_state,
    prime_decode_state,
    tdt_greedy_decode_chunk,
    tdt_greedy_decode_host,
)
from trt_asr_tpu.decode.timestamps import token_intervals, word_intervals
from trt_asr_tpu.models.parakeet import init_params, offline_encode
from trt_asr_tpu.models.parakeet.joint import joint_single_step
from trt_asr_tpu.models.parakeet.predictor import predictor_step
from trt_asr_tpu.tokenizer import Tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    return cfg, init_params(cfg, seed=3)


def _encode(cfg, params, rng, frames=150):
    feats = (0.6 * rng.standard_normal((1, frames, cfg.feat_in))).astype(np.float32)
    enc_j, enc_len = offline_encode(params, cfg, feats,
                                    np.array([frames], np.int32))
    return np.asarray(enc_j)[0], int(np.asarray(enc_len)[0])


def _host_stamps(cfg, params, enc):
    def j_joint(enc_t, g):
        return np.asarray(joint_single_step(params["joint"], enc_t[None], g[None]))[0]

    def j_pred(tok, st):
        h, c = st
        g, h2, c2 = predictor_step(params["predictor"], np.array([tok], np.int32), h, c)
        return np.asarray(g)[0], (h2, c2)

    ds0 = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    stamps = []
    toks, _, _, _ = tdt_greedy_decode_host(
        enc, j_joint, j_pred, (ds0.h, ds0.c), np.asarray(ds0.g)[0], cfg.blank_id,
        blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values,
        max_symbols=cfg.max_symbols_per_timestep, stamps_out=stamps)
    return toks, stamps


def test_device_stamps_match_host(setup, rng):
    cfg, params = setup
    enc, t = _encode(cfg, params, rng)
    host_toks, host_stamps = _host_stamps(cfg, params, enc[:t])

    ds0 = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    toks, n, _, (frames, durs, logps) = tdt_greedy_decode_chunk(
        params, cfg, enc, np.int32(t), ds0,
        max_tokens=cfg.max_symbols_per_timestep * t, with_timestamps=True)
    n = int(n)
    assert [int(x) for x in np.asarray(toks)[:n]] == host_toks
    got = list(zip(np.asarray(frames)[:n].tolist(), np.asarray(durs)[:n].tolist()))
    assert got == [(f, d) for f, d, _ in host_stamps]
    # decode-time confidences match the host log-softmax (f32 tolerance)
    np.testing.assert_allclose(np.asarray(logps)[:n],
                               [lp for _, _, lp in host_stamps], atol=1e-4)
    assert all(lp <= 1e-6 for lp in np.asarray(logps)[:n]), "logp must be <= 0"
    assert n > 0, "degenerate: nothing emitted"
    # padding past n stays -1
    assert all(int(f) == -1 for f in np.asarray(frames)[n:])


def test_pallas_joint_stamps_match_xla(setup, rng):
    """The fused joint kernel path yields the same anchors and (f32-level)
    confidences as the XLA path — the kernel returns raw logits, the
    confidence is computed identically outside it."""
    cfg, params = setup
    enc, t = _encode(cfg, params, rng, frames=120)
    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    toks_x, n_x, _, (fr_x, du_x, lp_x) = tdt_greedy_decode_chunk(
        params, cfg, enc, np.int32(t), ds,
        max_tokens=8 * t, with_timestamps=True)
    toks_p, n_p, _, (fr_p, du_p, lp_p) = tdt_greedy_decode_chunk(
        params, cfg, enc, np.int32(t), ds,
        max_tokens=8 * t, with_timestamps=True, use_pallas_joint=True)
    n = int(n_x)
    assert int(n_p) == n and n > 0
    assert np.asarray(toks_p)[:n].tolist() == np.asarray(toks_x)[:n].tolist()
    assert np.asarray(fr_p)[:n].tolist() == np.asarray(fr_x)[:n].tolist()
    assert np.asarray(du_p)[:n].tolist() == np.asarray(du_x)[:n].tolist()
    np.testing.assert_allclose(np.asarray(lp_p)[:n], np.asarray(lp_x)[:n],
                               atol=1e-4)


def test_chunked_absolute_frames_match_whole(setup, rng):
    """Per-chunk frames + session-style frame base == whole-utterance
    frames (the absolute-anchor arithmetic the session performs)."""
    cfg, params = setup
    enc, t = _encode(cfg, params, rng)

    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    toks_w, n_w, _, (fr_w, _du, _lp) = tdt_greedy_decode_chunk(
        params, cfg, enc[:t], np.int32(t), ds, max_tokens=8 * t,
        with_timestamps=True)
    whole = np.asarray(fr_w)[: int(n_w)].tolist()

    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    split = t // 2
    got, base, n_so_far = [], 0, 0
    for piece in (enc[:split], enc[split:t]):
        toks, n, ds, (fr, _d, _l) = tdt_greedy_decode_chunk(
            params, cfg, piece, np.int32(piece.shape[0]), ds,
            max_tokens=8 * t, emitted_so_far=np.int32(n_so_far),
            with_timestamps=True)
        got += [base + int(f) for f in np.asarray(fr)[: int(n)]]
        base += piece.shape[0]
        n_so_far += int(n)
    assert got == whole


def test_batched_stamps_match_single(setup, rng):
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch

    cfg, params = setup
    encs, ts = [], []
    for _ in range(3):
        e, t = _encode(cfg, params, rng, frames=120)
        encs.append(e[:15])
        ts.append(min(t, 15))
    enc_b = np.stack(encs)
    t_b = np.asarray(ts, np.int32)

    st = prime_decode_state(params, cfg, init_decode_state(cfg, 3), [])
    toks_b, n_b, _, (fr_b, du_b, lp_b) = tdt_greedy_decode_batch(
        params, cfg, enc_b, t_b, st, max_tokens=8 * 15, with_timestamps=True)
    for i in range(3):
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        toks_s, n_s, _, (fr_s, du_s, lp_s) = tdt_greedy_decode_chunk(
            params, cfg, encs[i], np.int32(ts[i]), ds, max_tokens=8 * 15,
            with_timestamps=True)
        n = int(n_s)
        assert int(n_b[i]) == n
        assert np.asarray(toks_b)[i, :n].tolist() == np.asarray(toks_s)[:n].tolist()
        assert np.asarray(fr_b)[i, :n].tolist() == np.asarray(fr_s)[:n].tolist()
        assert np.asarray(du_b)[i, :n].tolist() == np.asarray(du_s)[:n].tolist()
        # same logits, different matmul shapes: f32-tolerance confidence match
        np.testing.assert_allclose(np.asarray(lp_b)[i, :n],
                                   np.asarray(lp_s)[:n], atol=1e-5)


def _session_run(model, audio, hop):
    from trt_asr_tpu.streaming.session import StreamingSession

    sess = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    for s in range(0, len(audio), hop):
        sess.push_audio(audio[s : s + hop])
    sess.finalize()
    return sess


def _audio(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * (250 + 30 * seed) * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def model():
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT

    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def test_session_timestamps_push_invariant(model):
    audio = _audio(48000, 11)
    a = _session_run(model, audio, 16000)
    b = _session_run(model, audio, 3000)
    ts_a, ts_b = a.token_timestamps(), b.token_timestamps()
    assert len(ts_a) == len(a._tokens) > 0
    # different push granularities batch the mel DFT matmul differently, so
    # features (and logp) carry f32 reduction noise; anchors are exact
    assert len(ts_a) == len(ts_b)
    for x, y in zip(ts_a, ts_b):
        assert x["logp"] == pytest.approx(y["logp"], abs=1e-3)
        assert {k: v for k, v in x.items() if k != "logp"} == \
               {k: v for k, v in y.items() if k != "logp"}
    starts = [t["start_s"] for t in ts_a]
    assert starts == sorted(starts), "timestamps must be nondecreasing"
    dur_s = len(audio) / 16000
    for t in ts_a:
        assert 0.0 <= t["start_s"] < t["end_s"] <= dur_s + 1.0
        assert t["logp"] <= 1e-6
    # words cover the same span, grouped
    words, words_b = a.word_timestamps(), b.word_timestamps()
    assert words and len(words) == len(words_b)
    for x, y in zip(words, words_b):
        assert x["logp"] == pytest.approx(y["logp"], abs=5e-3)
        assert {k: v for k, v in x.items() if k != "logp"} == \
               {k: v for k, v in y.items() if k != "logp"}
    assert " ".join(w["word"] for w in words).replace("  ", " ").strip()


def test_session_timestamps_snapshot_restore(model):
    from trt_asr_tpu.streaming.session import StreamingSession

    audio = _audio(48000, 12)
    full = _session_run(model, audio, 8000)

    half = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    half.push_audio(audio[:24000])
    snap = half.snapshot()
    resumed = StreamingSession(model, RuntimeConfig(suppress_leading_punct=False))
    resumed.restore(snap)
    resumed.push_audio(audio[24000:])
    resumed.finalize()
    assert resumed.token_timestamps() == full.token_timestamps()


def test_engine_timestamps_match_session(model):
    from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine
    from trt_asr_tpu.streaming.schedule import ChunkScheduler
    from trt_asr_tpu.streaming.session import StreamingSession

    rt = RuntimeConfig(suppress_leading_punct=False)
    audio = _audio(40000, 13)

    sess = StreamingSession(model, rt)
    sess._sched = ChunkScheduler(model.cfg, unified=True)  # engine profile
    sess.push_audio(audio)
    sess.finalize()

    eng = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    sid = eng.open_stream()
    eng.push_audio(sid, audio)
    eng.finalize_stream(sid)
    eng.run_until_drained()

    ts_e, ts_s = eng.token_timestamps(sid), sess.token_timestamps()
    assert len(ts_e) == len(ts_s)
    for a, b in zip(ts_e, ts_s):
        # batched vs single-stream decode: same logits through different
        # matmul shapes — logp matches to f32 tolerance, rest exactly
        assert a["logp"] == pytest.approx(b["logp"], abs=2e-3)
        assert {k: v for k, v in a.items() if k != "logp"} == \
               {k: v for k, v in b.items() if k != "logp"}
    ws_e, ws_s = eng.word_timestamps(sid), sess.word_timestamps()
    assert len(ws_e) == len(ws_s)
    for a, b in zip(ws_e, ws_s):
        assert a["logp"] == pytest.approx(b["logp"], abs=5e-3)
        assert {k: v for k, v in a.items() if k != "logp"} == \
               {k: v for k, v in b.items() if k != "logp"}


def test_word_grouping_semantics():
    vocab = ["▁he", "llo", "▁wor", "ld", ".", "<s>", "▁hi"]
    tok = Tokenizer(vocab, blank_id=len(vocab))
    ids = [0, 1, 2, 3, 4, 6]
    frames = [2, 4, 10, 12, 13, 20]
    durs = [1, 2, 1, 0, 1, 3]
    frame_s = 0.08
    words = word_intervals(ids, frames, durs, tok, frame_s)
    assert [w["word"] for w in words] == ["hello", "world.", "hi"]
    # "hello": starts at frame 2, ends at frame 4 + dur 2 = 6
    assert words[0]["start_s"] == pytest.approx(2 * frame_s)
    assert words[0]["end_s"] == pytest.approx(6 * frame_s)
    # duration-0 token "ld" still occupies one frame; "." extends the word
    assert words[1]["start_s"] == pytest.approx(10 * frame_s)
    assert words[1]["end_s"] == pytest.approx(14 * frame_s)
    # blank + control tokens are dropped
    ids2 = [5, 0, len(vocab)]
    words2 = word_intervals(ids2, [0, 1, 2], [1, 1, 1], tok, frame_s)
    assert [w["word"] for w in words2] == ["he"]
    # token_intervals clamps zero durations to one frame
    iv = token_intervals([3], [0], frame_s)
    assert iv[0]["end_s"] == pytest.approx(iv[0]["start_s"] + frame_s)
