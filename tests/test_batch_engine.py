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


def _drain(q_poll, sid=None):
    evs = []
    while (e := (q_poll(sid) if sid is not None else q_poll())) is not None:
        evs.append(e)
    return evs


def test_event_protocol_parity_with_session(model):
    """VERDICT r1 #8: batched event protocol == single-stream session
    protocol — real segment ids, partial pacing, strictly-growing partial
    prefixes, one final, ERROR on push-after-finalize."""
    rt = RuntimeConfig(suppress_leading_punct=False, partial_min_interval_ms=0)
    audio = _audio(40000, 4)

    # single-stream reference protocol
    sess = StreamingSession(model, rt)
    sess._sched = ChunkScheduler(model.cfg, unified=True)
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
    sess.finalize()
    sev = _drain(lambda _ : sess.poll_event(), 0)
    sess.push_features(np.zeros((5, model.cfg.feat_in), np.float32))  # misuse
    serr = _drain(lambda _: sess.poll_event(), 0)

    eng = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    sid = eng.open_stream()
    for s in range(0, len(audio), 8000):
        eng.push_audio(sid, audio[s : s + 8000])
        while eng.step():
            pass
    eng.finalize_stream(sid)
    eng.run_until_drained()
    eev = _drain(eng.poll_event, sid)
    eng.push_features(sid, np.zeros((5, model.cfg.feat_in), np.float32))
    eerr = _drain(eng.poll_event, sid)

    # same terminal protocol: exactly one FINAL with identical tokens
    sfin = [e for e in sev if e.type == 1]
    efin = [e for e in eev if e.type == 1]
    assert len(sfin) == 1 and len(efin) == 1
    assert efin[0].tokens == sfin[0].tokens
    # real segment ids (session starts at 1; engine slot generation 1)
    assert {e.segment_id for e in sev} == {1}
    assert {e.segment_id for e in eev} == {1}
    # partials: non-empty, strictly growing prefixes of the final
    eparts = [e.tokens for e in eev if e.type == 0]
    assert eparts, "pacing=0 with emitted tokens must produce partials"
    for i, p in enumerate(eparts):
        assert p == efin[0].tokens[: len(p)]
        if i:
            assert len(p) > len(eparts[i - 1])
    # ERROR parity on push-after-finalize
    assert [e.type for e in serr] == [2] and [e.type for e in eerr] == [2]
    assert "finalize" in eerr[0].error_message

    # pacing: with an effectively-infinite interval neither emits partials
    rt2 = RuntimeConfig(suppress_leading_punct=False,
                        partial_min_interval_ms=10**9)
    eng2 = BatchStreamingEngine(model, batch_size=2, runtime=rt2)
    sid2 = eng2.open_stream()
    eng2.push_audio(sid2, audio)
    eng2.finalize_stream(sid2)
    eng2.run_until_drained()
    types = [e.type for e in _drain(eng2.poll_event, sid2)]
    assert types == [1], types

    # slot reuse bumps the segment id (utterance generation)
    eng2.close_stream(sid2)
    sid3 = eng2.open_stream()
    eng2.push_audio(sid3, audio[:16000])
    eng2.finalize_stream(sid3)
    eng2.run_until_drained()
    evs = _drain(eng2.poll_event, sid3)
    assert evs and all(e.segment_id == 2 for e in evs)


def test_mid_flight_attach_under_load(model):
    """A stream attached while the batch is mid-utterance matches its
    single-stream reference token-exactly, and doesn't disturb the running
    stream."""
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=4, runtime=rt)
    a0, a1 = _audio(48000, 11), _audio(32000, 12)

    s0 = eng.open_stream()
    eng.push_audio(s0, a0[:24000])
    steps = 0
    while eng.step():
        steps += 1
    assert steps > 0, "stream 0 must be mid-utterance before attach"

    s1 = eng.open_stream()   # attach under load
    eng.push_audio(s1, a1)
    eng.push_audio(s0, a0[24000:])
    eng.finalize_stream(s1)
    eng.run_until_drained()
    eng.finalize_stream(s0)
    eng.run_until_drained()

    for sid, a in ((s0, a0), (s1, a1)):
        want = _single_stream_tokens(model, a)
        got = [e for e in _drain(eng.poll_event, sid) if e.type == 1][0].tokens
        assert got == want, f"stream {sid}"


def test_flush_inside_lockstep_batch(model):
    """A finalizing stream's keep-all flush runs INSIDE the lockstep batched
    program while another stream continues steady chunks (no single-row
    escape; VERDICT r1 weak #5)."""
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    s0, s1 = eng.open_stream(), eng.open_stream()
    a0, a1 = _audio(48000, 21), _audio(20000, 22)
    eng.push_audio(s0, a0)
    eng.push_audio(s1, a1)
    eng.finalize_stream(s1)    # s1 flushes while s0 still has steady chunks
    n_before = len(eng.step_latencies_ms)
    eng.run_until_drained()
    eng.finalize_stream(s0)
    eng.run_until_drained()
    assert len(eng.step_latencies_ms) > n_before
    for sid, a in ((s0, a0), (s1, a1)):
        want = _single_stream_tokens(model, a)
        got = [e for e in _drain(eng.poll_event, sid) if e.type == 1][0].tokens
        assert got == want, f"stream {sid}"


def test_large_batch_per_step_decode_regime(model):
    """A wide engine (B*Tq > 256 -> the per-position decode regime) must
    still match single-stream decode token-exactly."""
    rt = RuntimeConfig(suppress_leading_punct=False)
    eng = BatchStreamingEngine(model, batch_size=36, runtime=rt)
    audios = {0: _audio(24000, 5), 1: _audio(30000, 6)}
    sids = {k: eng.open_stream() for k in audios}
    offs = {k: 0 for k in audios}
    while any(offs[k] < len(a) for k, a in audios.items()):
        for k, a in audios.items():
            if offs[k] < len(a):
                eng.push_audio(sids[k], a[offs[k] : offs[k] + 8000])
                offs[k] += 8000
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
        assert got == want, f"stream {k}"


def test_batch_step_pallas_att_token_exact(model):
    """_batch_step with the fused attention kernel (pad_steps + per-row
    cache_drop_vec) must be token-exact with the XLA path, closed loop."""
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.models.parakeet.encoder import precompute_pos_proj
    from trt_asr_tpu.ops.pallas.att_block_kernel import _round_up
    from trt_asr_tpu.streaming.batch_engine import _batch_step

    cfg = model.cfg
    params = model.params
    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    tq = frames
    for _ in range(cfg.stride_stages):
        tq = (tq - 1) // 2 + 1
    tq -= cfg.drop_extra_pre_encoded
    tq_pad = _round_up(tq, 8)
    pp = precompute_pos_proj(params, cfg, tq_pad, cfg.att_cache_size)
    r_pad = _round_up(pp.shape[1], 128)
    ppT = jnp.zeros((cfg.num_layers, cfg.d_model, r_pad), jnp.float32)
    ppT = ppT.at[:, :, : pp.shape[1]].set(jnp.swapaxes(pp, 1, 2))

    rng = np.random.default_rng(3)
    valid = jnp.full((1,), frames, jnp.int32)
    emitted = jnp.zeros((1,), jnp.int32)
    cdv = jnp.full((1,), cfg.cache_drop_size, jnp.int32)
    vcv = jnp.full((1,), cfg.valid_out_len, jnp.int32)
    kw = dict(drop_extra=cfg.drop_extra_pre_encoded, max_tokens=32,
              use_pallas_joint=False)

    es_a, ds_a = init_encoder_state(cfg, 1), init_decode_state(cfg, 1)
    es_b, ds_b = init_encoder_state(cfg, 1), init_decode_state(cfg, 1)
    for k in range(5):   # closed loop: caches thread forward
        f = jnp.asarray(rng.standard_normal((1, frames, cfg.feat_in)).astype(np.float32))
        toks_a, n_a, es_a, ds_a = _batch_step(
            params, cfg, f, valid, es_a, ds_a, emitted, cdv, vcv, **kw)
        toks_b, n_b, es_b, ds_b = _batch_step(
            params, cfg, f, valid, es_b, ds_b, emitted, cdv, vcv,
            pos_projT=ppT, pad_steps=tq_pad - tq, use_pallas_att=True, **kw)
        assert int(n_a[0]) == int(n_b[0]), f"chunk {k}"
        na = int(n_a[0])
        assert np.array_equal(np.asarray(toks_a)[0, :na],
                              np.asarray(toks_b)[0, :na]), f"chunk {k}"


def test_warmup_precompiles_without_touching_slots(model):
    """warmup() must (a) run the real lockstep program, (b) leave slot
    state untouched, and (c) change nothing about subsequent serving —
    transcript identical to an un-warmed engine (serve.py runs warmup
    before accepting clients)."""
    rt = RuntimeConfig(suppress_leading_punct=False)
    audio = _audio(30000, 5)

    cold = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    s0 = cold.open_stream()
    cold.push_audio(s0, audio)
    cold.finalize_stream(s0)
    cold.run_until_drained()
    want = list(cold._tokens[s0])

    warm = BatchStreamingEngine(model, batch_size=2, runtime=rt)
    sid = warm.open_stream()
    warm.push_audio(sid, audio[:4000])   # state in flight before warmup
    warm.step()
    mid_tokens = list(warm._tokens[sid])
    wall = warm.warmup()
    assert wall > 0
    assert warm._tokens[sid] == mid_tokens          # slots untouched
    assert warm._active[sid] and not warm._finalized[sid]
    warm.push_audio(sid, audio[4000:])
    warm.finalize_stream(sid)
    warm.run_until_drained()
    assert list(warm._tokens[sid]) == want
