"""Device-resident TDT beam search (decode/beam_device.py) vs the host
oracle (decode/beam.py): beam=1 == greedy, beam=4 n-best identical per
seed, offline and across streaming chunk boundaries."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode import init_decode_state, prime_decode_state
from trt_asr_tpu.decode.beam import (
    BeamSearchState,
    beam_advance,
    beam_finish,
    beam_start,
    make_host_fns,
    tdt_beam_decode_host,
)
from trt_asr_tpu.decode.beam_device import (
    beam_device_to_hypotheses,
    init_beam_device_state,
    tdt_beam_chunk_device,
)
from trt_asr_tpu.models.parakeet import init_params


def _setup(seed, **cfg_kw):
    cfg = ModelConfig.tiny(**cfg_kw)
    params = init_params(cfg, seed=seed)
    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    j_fn, p_fn, j_batch = make_host_fns(params)
    return cfg, params, ds, j_fn, p_fn, j_batch


def _host_nbest(cfg, ds, j_fn, p_fn, j_batch, enc, *, beam, **kw):
    return tdt_beam_decode_host(
        enc, j_fn, p_fn, (ds.h, ds.c), np.asarray(ds.g)[0],
        int(np.asarray(ds.y_id)[0]), blank_id=cfg.blank_id,
        token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values, beam=beam,
        max_symbols=cfg.max_symbols_per_timestep,
        joint_batch_fn=j_batch, **kw)


def _device_nbest(cfg, params, ds, enc, *, beam, **kw):
    st = init_beam_device_state(cfg, ds, beam=beam, token_cap=64)
    st = tdt_beam_chunk_device(
        params, cfg, enc, np.int32(enc.shape[0]), st, beam=beam,
        max_symbols=cfg.max_symbols_per_timestep, **kw)
    return beam_finish(BeamSearchState(
        active=beam_device_to_hypotheses(st)), beam=beam)


def _assert_nbest_match(host, dev, seed, atol=2e-3):
    assert [h.tokens for h in host] == [d.tokens for d in dev], \
        (seed, [h.tokens for h in host], [d.tokens for d in dev])
    for h, d in zip(host, dev):
        assert h.score == pytest.approx(d.score, abs=atol), (seed, h.tokens)
        # emission stamps: frames and durations exact, confidence close
        assert [(f, du) for f, du, _ in h.stamps] == \
               [(f, du) for f, du, _ in d.stamps], (seed, h.tokens)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_device_beam4_nbest_identical_to_host(seed, rng):
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(seed)
    enc = (0.6 * np.random.default_rng(seed)
           .standard_normal((9, cfg.d_model))).astype(np.float32)
    host = _host_nbest(cfg, ds, j_fn, p_fn, j_batch, enc, beam=4)
    dev = _device_nbest(cfg, params, ds, enc, beam=4)
    _assert_nbest_match(host, dev, seed)


@pytest.mark.parametrize("seed", [0, 3, 9])
def test_device_beam1_equals_greedy(seed):
    """beam=1 must reproduce the greedy decoder token-for-token (the same
    anchor the host beam is tested against)."""
    from trt_asr_tpu.decode.tdt_greedy import tdt_greedy_decode_chunk

    cfg, params, ds, j_fn, p_fn, j_batch = _setup(seed)
    enc = (0.6 * np.random.default_rng(100 + seed)
           .standard_normal((12, cfg.d_model))).astype(np.float32)
    toks, n, _ = tdt_greedy_decode_chunk(
        params, cfg, enc, np.int32(enc.shape[0]), ds, max_tokens=48)
    greedy = [int(t) for t in np.asarray(toks)[: int(n)]]
    dev = _device_nbest(cfg, params, ds, enc, beam=1)
    assert dev[0].tokens == greedy, seed


@pytest.mark.parametrize("seed", [0, 2, 5])
def test_device_beam_chunked_matches_host_chunked(seed):
    """Chunk-by-chunk advance with waiting hypotheses (cross-chunk duration
    jumps): the carried device pool equals the host pool after every
    chunk."""
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(seed)
    r = np.random.default_rng(200 + seed)
    enc = (0.6 * r.standard_normal((12, cfg.d_model))).astype(np.float32)

    bs = beam_start(np.asarray(ds.g)[0], int(np.asarray(ds.y_id)[0]),
                    (ds.h, ds.c))
    st = init_beam_device_state(cfg, ds, beam=4, token_cap=64)
    consumed = 0
    for lo in range(0, enc.shape[0], 3):
        hi = min(lo + 3, enc.shape[0])
        bs = beam_advance(
            bs, enc[lo:hi], j_fn, p_fn, blank_id=cfg.blank_id,
            token_head_size=cfg.token_head_size,
            duration_values=cfg.duration_values, beam=4,
            max_symbols=cfg.max_symbols_per_timestep,
            joint_batch_fn=j_batch)
        st = tdt_beam_chunk_device(
            params, cfg, enc[lo:hi], np.int32(hi - lo), st, beam=4,
            max_symbols=cfg.max_symbols_per_timestep)
        consumed = hi
        dev_hyps = beam_device_to_hypotheses(st)
        host_pool = sorted(((tuple(h.tokens), h.cursor, h.score)
                            for h in bs.active))
        dev_pool = sorted(((tuple(h.tokens), h.cursor, h.score)
                           for h in dev_hyps))
        assert [p[:2] for p in host_pool] == [p[:2] for p in dev_pool], \
            (seed, lo, host_pool, dev_pool)
        for hp, dp in zip(host_pool, dev_pool):
            assert hp[2] == pytest.approx(dp[2], abs=2e-3), (seed, lo)
    assert consumed == enc.shape[0]
    host_fin = beam_finish(bs, beam=4)
    dev_fin = beam_finish(BeamSearchState(
        active=beam_device_to_hypotheses(st)), beam=4)
    _assert_nbest_match(host_fin, dev_fin, seed)


def test_device_beam_punct_and_penalty():
    """Leading-punct suppression and blank penalty flow through the device
    search identically to the host."""
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(11)
    r = np.random.default_rng(11)
    enc = (0.6 * r.standard_normal((8, cfg.d_model))).astype(np.float32)
    punct = np.zeros(cfg.token_head_size, bool)
    punct[: cfg.vocab_size // 2] = True   # half the vocab "is punctuation"
    host = _host_nbest(cfg, ds, j_fn, p_fn, j_batch, enc, beam=4,
                       blank_penalty=0.7, punct_token_ids=set(
                           np.flatnonzero(punct).tolist()))
    dev = _device_nbest(cfg, params, ds, enc, beam=4, blank_penalty=0.7,
                        punct_mask=punct, use_punct_mask=True)
    _assert_nbest_match(host, dev, 11)


def _audio(seed=0, n=24000):
    r = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.3 * np.sin(2 * np.pi * (200 + 40 * r.integers(0, 5)) *
                         t / 16000) +
            0.05 * r.standard_normal(n)).astype(np.float32)


def test_device_beam_session_matches_host_session():
    """BeamStreamingSession(device=True): n-best identical to the host
    beam session on the same streamed audio, and beam=1 == greedy."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
    from trt_asr_tpu.streaming.session import StreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=7)
    audio = _audio(7)

    def run(sess):
        for lo in range(0, audio.size, 8000):
            sess.push_audio(audio[lo:lo + 8000])
        sess.finalize()
        return sess

    host = run(BeamStreamingSession(model, beam=4, runtime=RuntimeConfig()))
    dev = run(BeamStreamingSession(model, beam=4, device=True,
                                   runtime=RuntimeConfig()))
    host_nb = host.nbest()
    dev_nb = dev.nbest()
    assert [ids for _, ids, _ in host_nb] == [ids for _, ids, _ in dev_nb]
    for (_, _, sh), (_, _, sd) in zip(host_nb, dev_nb):
        assert sh == pytest.approx(sd, abs=2e-3)
    # 1-best timestamps survive the device roundtrip
    assert host.token_timestamps() == dev.token_timestamps()

    greedy = run(StreamingSession(model, RuntimeConfig()))
    dev1 = run(BeamStreamingSession(model, beam=1, device=True,
                                    runtime=RuntimeConfig()))
    assert dev1._tokens == greedy._tokens


def test_token_cap_saturation_beam1_head_preserved():
    """Saturating a cap=8 greedy-mode device beam: the flag latches, n_tok
    clamps at the cap, and the buffer holds EXACTLY the first 8 tokens of
    an uncapped run of the same input (head-preserving truncation —
    beam_device.py module docstring)."""
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(21)
    r = np.random.default_rng(21)
    enc = (0.6 * r.standard_normal((80, cfg.d_model))).astype(np.float32)
    kw = dict(beam=1, max_symbols=cfg.max_symbols_per_timestep,
              blank_penalty=6.0)   # force emission nearly every frame

    def run(cap):
        st = init_beam_device_state(cfg, ds, beam=1, token_cap=cap)
        return tdt_beam_chunk_device(
            params, cfg, enc, np.int32(enc.shape[0]), st, **kw)

    big = run(256)
    n_big = int(np.asarray(big.n_tok)[0])
    assert n_big > 8, "setup failed to emit enough tokens to saturate"
    assert not bool(np.asarray(big.sat)[0])

    sat = run(8)
    assert bool(np.asarray(sat.sat)[0])
    assert int(np.asarray(sat.n_tok)[0]) == 8
    head = np.asarray(sat.tokens)[0, :8].tolist()
    assert head == np.asarray(big.tokens)[0, :8].tolist()
    # stamps of the preserved head survive too
    assert (np.asarray(sat.frames)[0, :8].tolist()
            == np.asarray(big.frames)[0, :8].tolist())


def test_token_cap_saturation_beam4_flag_propagates():
    """beam=4 under saturation: every live hypothesis that overflowed
    carries sat=True through expansion, merging and pruning; nothing
    writes past the cap."""
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(22)
    r = np.random.default_rng(22)
    st = init_beam_device_state(cfg, ds, beam=4, token_cap=8)
    for _ in range(3):   # chunked: saturation must survive the carry
        enc = (0.6 * r.standard_normal((24, cfg.d_model))).astype(np.float32)
        st = tdt_beam_chunk_device(
            params, cfg, enc, np.int32(enc.shape[0]), st, beam=4,
            max_symbols=cfg.max_symbols_per_timestep, blank_penalty=6.0)
    score = np.asarray(st.score)
    live = np.isfinite(score)
    assert live.any()
    assert np.all(np.asarray(st.n_tok)[live] <= 8)
    assert bool(np.any(np.asarray(st.sat)[live]))
    # the truncated pool still yields well-formed host hypotheses
    hyps = beam_device_to_hypotheses(st)
    assert all(len(h.tokens) <= 8 and len(h.stamps) == len(h.tokens)
               for h in hyps)


def test_token_cap_saturation_session_error_event():
    """BeamStreamingSession(device=True) surfaces saturation exactly once
    per utterance as an ERROR event and still finalizes normally."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
    from trt_asr_tpu.streaming.session import EventType

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=7)
    audio = _audio(7, n=32000)
    sess = BeamStreamingSession(
        model, beam=2, device=True, token_cap=2,
        runtime=RuntimeConfig(blank_penalty=6.0))
    for lo in range(0, audio.size, 8000):
        sess.push_audio(audio[lo:lo + 8000])
    sess.finalize()
    events = []
    while (ev := sess.poll_event()) is not None:
        events.append(ev)
    errs = [ev for ev in events if ev.type == EventType.ERROR]
    assert len(errs) == 1, [ev.type for ev in events]
    assert "token_cap" in errs[0].error_message
    assert any(ev.type == EventType.FINAL_TEXT for ev in events)
    assert all(len(ids) <= 2 for _, ids, _ in sess.nbest())


def test_device_beam_session_rejects_lm():
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=1)
    with pytest.raises(ValueError, match="lm_fn"):
        BeamStreamingSession(model, beam=4, device=True,
                             lm_fn=lambda p, t: 0.0, lm_weight=0.5)
