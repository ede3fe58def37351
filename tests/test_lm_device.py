"""Device-compiled shallow fusion (decode/lm_device.py): score parity
with the host NGramLM / BiasingLM callables, and device-beam n-best
identity with the host beam under fusion."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode import init_decode_state, prime_decode_state
from trt_asr_tpu.decode.beam import make_host_fns, tdt_beam_decode_host
from trt_asr_tpu.decode.beam_device import (
    beam_device_to_hypotheses,
    init_beam_device_state,
    tdt_beam_chunk_device,
)
from trt_asr_tpu.decode.beam import BeamSearchState, beam_finish
from trt_asr_tpu.decode.biasing import BiasingLM
from trt_asr_tpu.decode.lm_device import (
    biasing_to_device,
    lm_scores,
    ngram_to_device,
    to_device,
)
from trt_asr_tpu.decode.ngram_lm import NGramLM
from trt_asr_tpu.models.parakeet import init_params


def _random_lm(seed, vocab=40, order=3, n_seq=30):
    r = np.random.default_rng(seed)
    seqs = [r.integers(0, vocab, size=r.integers(1, 12)).tolist()
            for _ in range(n_seq)]
    return NGramLM.fit(seqs, order=order, vocab_size=vocab)


def _device_scores(spec, tables, prefix, cands, token_cap=32):
    buf = np.full((1, token_cap), -1, np.int32)
    buf[0, : len(prefix)] = prefix
    out = lm_scores(spec, tables, buf, np.asarray([len(prefix)], np.int32),
                    np.asarray([cands], np.int32))
    return np.asarray(out)[0]


@pytest.mark.parametrize("seed,order", [(0, 2), (1, 3), (2, 4)])
def test_ngram_device_matches_host(seed, order):
    """Every backoff depth: seen full context, partial backoff, unigram
    hit, and the add-1 unseen floor — device == host to f32 rounding."""
    lm = _random_lm(seed, order=order)
    spec, tables = ngram_to_device(lm)
    r = np.random.default_rng(100 + seed)
    for _ in range(50):
        prefix = r.integers(0, lm.vocab_size, size=r.integers(0, 8)).tolist()
        cands = r.integers(0, lm.vocab_size, size=6).tolist()
        got = _device_scores(spec, tables, prefix, cands)
        want = [lm.score(prefix, c) for c in cands]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_ngram_device_trained_transitions():
    """Contexts straight from the training data (the high-count path the
    random mix above may under-sample)."""
    lm = _random_lm(7, order=3)
    spec, tables = ngram_to_device(lm)
    checked = 0
    for ctx, counter in list(lm.counts.items())[:40]:
        if len(ctx) != 2 or any(t < 0 for t in ctx):
            continue
        toks = list(counter)[:3]
        got = _device_scores(spec, tables, list(ctx), toks)
        want = [lm.score(list(ctx), t) for t in toks]
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
        checked += 1
    assert checked > 5


def test_ngram_device_out_of_vocab_candidate():
    """A candidate id >= lm.vocab_size takes the host's add-1 floor, not a
    clipped neighbor's logp."""
    lm = _random_lm(3, vocab=20)
    spec, tables = ngram_to_device(lm)
    got = _device_scores(spec, tables, [1, 2], [25])
    assert got[0] == pytest.approx(lm.score([1, 2], 25), abs=1e-5)


def _bias_lm(seed, vocab=40, n_phrases=6):
    r = np.random.default_rng(seed)
    phrases = [tuple(r.integers(0, vocab, size=r.integers(1, 4)).tolist())
               for _ in range(n_phrases)]
    cont = {}
    for p in phrases:
        for k in range(len(p)):
            cont.setdefault(p[:k], set()).add(p[k])
    max_pfx = max(len(p) - 1 for p in phrases)
    return BiasingLM(cont, max_pfx, 3.0, vocab), phrases


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_biasing_device_matches_host(seed):
    bias, phrases = _bias_lm(seed)
    spec, tables = biasing_to_device(bias)
    r = np.random.default_rng(50 + seed)
    # targeted queries: inside a phrase (hit) and random (mostly miss)
    cases = []
    for p in phrases:
        for k in range(len(p)):
            cases.append((list(p[:k]), p[k]))                 # continuation
            cases.append((list(p[:k]), int(r.integers(0, 40))))
    for _ in range(40):
        cases.append((r.integers(0, 40, size=r.integers(0, 6)).tolist(),
                      int(r.integers(0, 40))))
    for prefix, tok in cases:
        got = _device_scores(spec, tables, prefix, [tok])
        assert got[0] == pytest.approx(bias(prefix, tok), abs=1e-6), \
            (seed, prefix, tok)


def test_to_device_dispatch():
    lm = _random_lm(0)
    assert to_device(lm)[0].mode == "backoff"
    bias, _ = _bias_lm(0)
    assert to_device(bias)[0].mode == "bonus"
    assert to_device(lambda p, t: 0.0) is None


def test_vocab_overflow_rejected():
    """order-5 (two context tokens per half) at 50k vocab overflows int32."""
    lm = _random_lm(0, order=5)
    lm.vocab_size = 50_000
    with pytest.raises(ValueError, match="Horner"):
        ngram_to_device(lm)


def test_long_context_overflow_rejected():
    """The ADVICE r4 case: order-6 packs ceil(5/2)=3 tokens per half, so
    vocab > 1288 overflows even though the old 2-token check passed."""
    lm = _random_lm(0, vocab=30, order=6)
    lm.vocab_size = 2_000
    with pytest.raises(ValueError, match="Horner"):
        ngram_to_device(lm)


def test_order3_large_vocab_accepted():
    """Conversely order-3 (one token per half) is exact at any int32 vocab;
    the old quadratic check wrongly rejected it."""
    lm = _random_lm(0, vocab=40, order=3)
    lm.vocab_size = 50_000
    spec, tables = ngram_to_device(lm)
    got = _device_scores(spec, tables, [1, 2], [3])
    assert got[0] == pytest.approx(lm.score([1, 2], 3), abs=1e-5)


def test_out_of_vocab_trained_id_rejected():
    """A trained token id >= vocab_size would make host (dict hit) and
    device (dense-table floor) diverge — build must refuse it."""
    lm = _random_lm(0, vocab=40)
    lm.vocab_size = 10
    with pytest.raises(ValueError, match="vocab_size"):
        ngram_to_device(lm)


# -- fused beam identity: device search == host search under the LM ------


def _setup(seed):
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=seed)
    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    j_fn, p_fn, j_batch = make_host_fns(params)
    return cfg, params, ds, j_fn, p_fn, j_batch


def _nbest_pair(seed, lm_fn, lm_weight):
    cfg, params, ds, j_fn, p_fn, j_batch = _setup(seed)
    enc = (0.6 * np.random.default_rng(seed)
           .standard_normal((9, cfg.d_model))).astype(np.float32)
    host = tdt_beam_decode_host(
        enc, j_fn, p_fn, (ds.h, ds.c), np.asarray(ds.g)[0],
        int(np.asarray(ds.y_id)[0]), blank_id=cfg.blank_id,
        token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values, beam=4,
        max_symbols=cfg.max_symbols_per_timestep, joint_batch_fn=j_batch,
        lm_fn=lm_fn, lm_weight=lm_weight)
    spec, tables = to_device(lm_fn)
    st = init_beam_device_state(cfg, ds, beam=4, token_cap=64)
    st = tdt_beam_chunk_device(
        params, cfg, enc, np.int32(enc.shape[0]), st, beam=4,
        max_symbols=cfg.max_symbols_per_timestep,
        lm_spec=spec, lm_tables=tables, lm_weight=lm_weight)
    dev = beam_finish(BeamSearchState(
        active=beam_device_to_hypotheses(st)), beam=4)
    return host, dev


def _assert_match(host, dev, seed):
    assert [h.tokens for h in host] == [d.tokens for d in dev], seed
    for h, d in zip(host, dev):
        assert h.score == pytest.approx(d.score, abs=2e-3), (seed, h.tokens)


@pytest.mark.parametrize("seed", [0, 1, 4])
def test_device_beam_ngram_fusion_matches_host(seed):
    cfg = ModelConfig.tiny()
    lm = _random_lm(seed, vocab=cfg.token_head_size, order=3, n_seq=60)
    host, dev = _nbest_pair(seed, lm, lm_weight=0.6)
    _assert_match(host, dev, seed)


def test_ngram_fusion_actually_changes_search():
    """Guards a silently ignored lm_weight (ADVICE r4): the fused host
    n-best must differ from the unfused one — in scores always (any
    emitted token adds weight * logp < 0), and in tokens for >= 1 seed."""
    any_score_diff = any_token_diff = False
    cfg = ModelConfig.tiny()
    for seed in (0, 1, 4):
        lm = _random_lm(seed, vocab=cfg.token_head_size, order=3, n_seq=60)
        fused, _ = _nbest_pair(seed, lm, lm_weight=0.6)
        unfused, _ = _nbest_pair(seed, lm, lm_weight=0.0)
        if [h.tokens for h in fused] != [h.tokens for h in unfused]:
            any_token_diff = True
        if any(abs(f.score - u.score) > 1e-6
               for f, u in zip(fused, unfused) if f.tokens or u.tokens):
            any_score_diff = True
    assert any_score_diff and any_token_diff


@pytest.mark.parametrize("seed", [2, 5])
def test_device_beam_bias_fusion_matches_host(seed):
    cfg = ModelConfig.tiny()
    r = np.random.default_rng(seed)
    phrases = [tuple(r.integers(0, cfg.token_head_size,
                                size=r.integers(1, 3)).tolist())
               for _ in range(5)]
    cont = {}
    for p in phrases:
        for k in range(len(p)):
            cont.setdefault(p[:k], set()).add(p[k])
    bias = BiasingLM(cont, max(len(p) - 1 for p in phrases), 2.5,
                     cfg.token_head_size)
    host, dev = _nbest_pair(seed, bias, lm_weight=1.0)
    _assert_match(host, dev, seed)


def test_device_beam_session_with_ngram_matches_host_session():
    """BeamStreamingSession(device=True, lm_fn=NGramLM): transcripts and
    n-best identical to the host fused session on streamed audio."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=7)
    lm = _random_lm(9, vocab=model.cfg.token_head_size, n_seq=80)
    r = np.random.default_rng(3)
    t = np.arange(24000)
    audio = (0.3 * np.sin(2 * np.pi * 300 * t / 16000)
             + 0.05 * r.standard_normal(t.size)).astype(np.float32)

    def run(**kw):
        s = BeamStreamingSession(model, beam=4, lm_fn=lm, lm_weight=0.5,
                                 runtime=RuntimeConfig(), **kw)
        for lo in range(0, audio.size, 8000):
            s.push_audio(audio[lo:lo + 8000])
        s.finalize()
        return s

    host, dev = run(), run(device=True)
    host_nb, dev_nb = host.nbest(), dev.nbest()
    assert [ids for _, ids, _ in host_nb] == [ids for _, ids, _ in dev_nb]
    for (_, _, sh), (_, _, sd) in zip(host_nb, dev_nb):
        assert sh == pytest.approx(sd, abs=2e-3)


def test_device_beam_session_still_rejects_arbitrary_callable():
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=1)
    with pytest.raises(ValueError, match="lm_fn"):
        BeamStreamingSession(model, beam=4, device=True,
                             lm_fn=lambda p, t: 0.0, lm_weight=0.5)
