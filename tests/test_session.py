"""Streaming session behavior: event protocol, chunking invariance,
reset/reuse — the runtime-core semantics of the reference's C ABI surface
(create/reset/push/poll, SURVEY §3.1-3.2)."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import EventType, StreamingSession


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audio(n=48000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _run(model, audio, chunk):
    sess = StreamingSession(model, RuntimeConfig())
    for s in range(0, len(audio), chunk):
        sess.push_audio(audio[s : s + chunk])
    sess.finalize()
    events = []
    while (ev := sess.poll_event()) is not None:
        events.append(ev)
    return sess, events


def test_event_protocol(model):
    sess, events = _run(model, _audio(), 8000)
    assert events, "no events emitted"
    assert events[-1].type == EventType.FINAL_TEXT
    final = events[-1]
    assert final.text == sess.text
    assert sess.chunk_latencies_ms, "no chunks processed"


def test_chunking_invariance(model):
    """Push granularity must not change the transcript (absolute-frame
    scheduler + feature carry)."""
    audio = _audio()
    _, ev_a = _run(model, audio, 3200)
    _, ev_b = _run(model, audio, 16000)
    _, ev_c = _run(model, audio, len(audio))
    fa = [e for e in ev_a if e.type == EventType.FINAL_TEXT][0]
    fb = [e for e in ev_b if e.type == EventType.FINAL_TEXT][0]
    fc = [e for e in ev_c if e.type == EventType.FINAL_TEXT][0]
    assert fa.tokens == fb.tokens == fc.tokens


def test_reset_reuse(model):
    audio = _audio()
    sess = StreamingSession(model, RuntimeConfig())
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
    sess.finalize()
    t1 = sess.text
    sess.reset_utterance()
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
    sess.finalize()
    assert sess.text == t1, "state leaked across reset"


def test_push_after_finalize_errors(model):
    sess, _ = _run(model, _audio(16000), 16000)
    sess.push_features(np.zeros((10, model.cfg.feat_in), np.float32))
    evs = []
    while (ev := sess.poll_event()) is not None:
        evs.append(ev)
    assert any(e.type == EventType.ERROR for e in evs)


def test_offline_transcribe(model):
    text, ids = model.transcribe_offline(_audio(32000), norm="per_feature")
    assert isinstance(text, str)
    assert all(0 <= i < model.cfg.vocab_size for i in ids)
    # determinism
    text2, ids2 = model.transcribe_offline(_audio(32000), norm="per_feature")
    assert ids == ids2


def test_model_dir_roundtrip(model, tmp_path):
    d = str(tmp_path / "m")
    model.save_model_dir(d)
    m2 = ParakeetTDT.from_model_dir(d)
    audio = _audio(24000)
    t1, i1 = model.transcribe_offline(audio)
    t2, i2 = m2.transcribe_offline(audio)
    assert i1 == i2 and t1 == t2


def test_pallas_att_transcript_identical(model):
    """use_pallas_att (fused attention-block kernel, interpret mode on CPU)
    must be token-exact with the XLA path through the full session."""
    audio = _audio(32000, seed=3)
    sess_a = StreamingSession(model, RuntimeConfig())
    sess_b = StreamingSession(model, RuntimeConfig(use_pallas_att=True))
    for sess in (sess_a, sess_b):
        for s in range(0, len(audio), 8000):
            sess.push_audio(audio[s : s + 8000])
        sess.finalize()
    assert sess_b._tokens == sess_a._tokens
    assert sess_b.text == sess_a.text


def test_batched_decode_transcript_identical(model):
    """Session default (blank-run batched decode) == per-step loop decode."""
    audio = _audio(32000, seed=9)
    sess_a = StreamingSession(model, RuntimeConfig(batched_decode=False))
    sess_b = StreamingSession(model, RuntimeConfig(batched_decode=True))
    for sess in (sess_a, sess_b):
        for s in range(0, len(audio), 6400):
            sess.push_audio(audio[s : s + 6400])
        sess.finalize()
    assert sess_b._tokens == sess_a._tokens


def test_all_pallas_kernels_transcript_identical(model):
    """att + conv + FFN fused kernels (interpret mode on CPU) must be
    token-exact with the XLA path through the full session."""
    audio = _audio(24000, seed=4)
    sess_a = StreamingSession(model, RuntimeConfig())
    sess_b = StreamingSession(model, RuntimeConfig(
        use_pallas_att=True, use_pallas_conv=True, use_pallas_ffn=True))
    for sess in (sess_a, sess_b):
        for s in range(0, len(audio), 8000):
            sess.push_audio(audio[s : s + 8000])
        sess.finalize()
    assert sess_b._tokens == sess_a._tokens


def test_fast_mode_production_invariants(model):
    """The full fast-mode stack (int8 + fused attention kernel + batched
    decode) must preserve the session invariants: push-granularity
    invariance and snapshot/restore transcript identity."""
    from trt_asr_tpu.models.parakeet.quant import quantize_params

    audio = _audio(32000, seed=11)
    rt = RuntimeConfig(use_pallas_att=True, batched_decode=True)
    qm = ParakeetTDT(model.cfg, quantize_params(model.params, "all"),
                     model.tokenizer, runtime=rt)

    def run(chunk):
        sess = StreamingSession(qm, rt)
        for s in range(0, len(audio), chunk):
            sess.push_audio(audio[s : s + chunk])
        sess.finalize()
        return sess

    a, b = run(3200), run(16000)
    assert a._tokens == b._tokens, "granularity invariance broke in fast mode"

    # snapshot mid-stream, restore into a fresh session, finish both
    sess1 = StreamingSession(qm, rt)
    sess1.push_audio(audio[:16000])
    snap = sess1.snapshot()
    sess2 = StreamingSession(qm, rt)
    sess2.restore(snap)
    for sess in (sess1, sess2):
        sess.push_audio(audio[16000:])
        sess.finalize()
    assert sess2._tokens == sess1._tokens == a._tokens


def test_concurrent_push_poll(model):
    """Event queue under a producer/consumer thread pair — the daemon
    embedding pattern the reference serves with its mutex-guarded queue
    (parakeet_trt.cpp:1649-1650). The poller drains WHILE the pusher
    streams; the final transcript must equal the serial run's and every
    polled event must be well-formed."""
    import threading

    audio = _audio()
    _, serial_events = _run(model, audio, 8000)
    serial_final = serial_events[-1].text

    sess = StreamingSession(model, RuntimeConfig())
    done = threading.Event()
    push_err = []

    def pusher():
        try:
            for s in range(0, len(audio), 8000):
                sess.push_audio(audio[s : s + 8000])
            sess.finalize()
        except Exception as e:  # noqa: BLE001
            push_err.append(e)
        finally:
            done.set()

    events = []
    t = threading.Thread(target=pusher)
    t.start()
    while not (done.is_set() and not push_err):
        ev = sess.poll_event()
        if ev is None:
            if done.is_set():
                break
            continue
        assert ev.type in (EventType.PARTIAL_TEXT, EventType.FINAL_TEXT,
                           EventType.ERROR)
        events.append(ev)
    t.join()
    assert not push_err, push_err
    while (ev := sess.poll_event()) is not None:
        events.append(ev)
    finals = [e for e in events if e.type == EventType.FINAL_TEXT]
    assert finals and finals[-1].text == serial_final
    assert not any(e.type == EventType.ERROR for e in events)


def test_language_prompt_selection(monkeypatch):
    """TRT_ASR_LANG selects the language prompt token; a missing token
    primes nothing (fallback); default stays <|en|> (reference hardcodes
    it, parakeet_trt.cpp:1931-1942 — this generalizes to the 0.6B-v3's
    25 languages)."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    vocab = make_synthetic_vocab(
        64, prompt_tokens=("<|startoftranscript|>", "<|en|>", "<|de|>"))
    m = ParakeetTDT.random(ModelConfig.tiny(), seed=1)
    m.tokenizer = Tokenizer(vocab, blank_id=m.cfg.blank_id)
    sot = m.tokenizer.token_id("<|startoftranscript|>")

    assert m.prompt_ids == [sot, m.tokenizer.token_id("<|en|>")]
    m.runtime = RuntimeConfig(language="de")
    assert m.prompt_ids == [sot, m.tokenizer.token_id("<|de|>")]
    m.runtime = RuntimeConfig(language="xx")   # not in vocab
    assert m.prompt_ids == [sot]
    monkeypatch.setenv("TRT_ASR_LANG", "de")
    assert RuntimeConfig.from_env().language == "de"


def test_extra_prompt_tokens(monkeypatch):
    """TRT_ASR_EXTRA_PROMPT primes optional constraint tokens (<|nopnc|>,
    <|noitn|>) AFTER start+language; default primes none — the reference
    measured constraint priming biases decoding toward punctuation spam
    and skips it unconditionally (parakeet_trt.cpp:1933-1944); here the
    decision is a measurable knob."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    vocab = make_synthetic_vocab(
        64, prompt_tokens=("<|startoftranscript|>", "<|en|>"))
    m = ParakeetTDT.random(ModelConfig.tiny(), seed=1)
    m.tokenizer = Tokenizer(vocab, blank_id=m.cfg.blank_id)
    sot = m.tokenizer.token_id("<|startoftranscript|>")
    en = m.tokenizer.token_id("<|en|>")
    nopnc = m.tokenizer.token_id("<|nopnc|>")
    assert nopnc >= 0  # synthetic vocab carries the constraint tokens

    assert m.prompt_ids == [sot, en]                       # default: none
    m.runtime = RuntimeConfig(extra_prompt="<|nopnc|>,<|noitn|>")
    assert m.prompt_ids == [sot, en, nopnc,
                            m.tokenizer.token_id("<|noitn|>")]
    m.runtime = RuntimeConfig(extra_prompt="<|missing|>")  # absent: skipped
    assert m.prompt_ids == [sot, en]
    monkeypatch.setenv("TRT_ASR_EXTRA_PROMPT", "<|nopnc|>")
    assert RuntimeConfig.from_env().extra_prompt == "<|nopnc|>"
