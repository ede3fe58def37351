"""TDT beam search (decode/beam.py): beam=1 == greedy token-exact; a wider
beam recovers higher-probability sequences greedy provably misses
(scripted-joint counterexample); n-best is sorted, deduped, and exposed at
the model level."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.decode import tdt_greedy_decode_host
from trt_asr_tpu.decode.beam import tdt_beam_decode_host
from trt_asr_tpu.models.parakeet import init_params, offline_encode
from trt_asr_tpu.models.parakeet.joint import joint_single_step
from trt_asr_tpu.models.parakeet.predictor import predictor_step


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    return cfg, init_params(cfg, seed=3)


def _jax_fns(cfg, params):
    def j_fn(enc_t, g):
        return np.asarray(joint_single_step(params["joint"], enc_t[None], g[None]))[0]

    def p_fn(tok, st):
        h, c = st
        g, h2, c2 = predictor_step(params["predictor"], np.array([tok], np.int32), h, c)
        return np.asarray(g)[0], (h2, c2)

    return j_fn, p_fn


def test_beam1_matches_greedy(setup, rng):
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state

    cfg, params = setup
    feats = (0.6 * rng.standard_normal((1, 150, cfg.feat_in))).astype(np.float32)
    enc_j, enc_len = offline_encode(params, cfg, feats, np.array([150], np.int32))
    t = int(np.asarray(enc_len)[0])
    enc = np.asarray(enc_j)[0, :t]
    j_fn, p_fn = _jax_fns(cfg, params)

    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    greedy, _, _, _ = tdt_greedy_decode_host(
        enc, j_fn, p_fn, (ds.h, ds.c), np.asarray(ds.g)[0], cfg.blank_id,
        blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values,
        max_symbols=cfg.max_symbols_per_timestep)

    hyps = tdt_beam_decode_host(
        enc, j_fn, p_fn, (ds.h, ds.c), np.asarray(ds.g)[0], cfg.blank_id,
        blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values, beam=1,
        max_symbols=cfg.max_symbols_per_timestep)
    assert len(hyps) == 1
    assert hyps[0].tokens == greedy
    assert greedy, "degenerate: greedy emitted nothing"


def _scripted():
    """Two-frame script where greedy is provably suboptimal: token 7 wins
    frame 0 by a nose (logit 2.0 vs 1.6) but leads to an uncertain frame 1
    (blank 0.1 vs token 9 at 0.0), while token 8 makes frame 1 near-certain
    blank (logit 8). Total path log-prob of [8] beats [7]."""
    cfg = ModelConfig.tiny()
    blank, ths = cfg.blank_id, cfg.token_head_size
    v = cfg.joint_vocab_size

    def joint_fn(enc_t, g):
        t, y = int(enc_t[0]), int(g[0])
        logits = np.full(v, -5.0, np.float32)
        logits[ths + 1] = 5.0          # duration 1 always
        if t == 0:
            logits[7], logits[8] = 2.0, 1.6
        elif y == 7:
            logits[blank], logits[9] = 0.1, 0.0
        elif y == 8:
            logits[blank] = 8.0
        else:
            logits[blank] = 8.0
        return logits

    def pred_fn(tok, st):
        return np.array([tok], np.float32), (tok,)

    return cfg, joint_fn, pred_fn


def _path_score(cfg, joint_fn, steps):
    """Sum of log-softmax(token) + log-softmax(duration) along a path of
    (enc_t, y_before, token, dur_idx)."""
    ths, nd = cfg.token_head_size, cfg.num_duration_bins
    total = 0.0
    for enc_t, y, tok, di in steps:
        logits = joint_fn(np.array([enc_t], np.float32), np.array([y]))
        lt = logits[:ths] - np.log(np.sum(np.exp(logits[:ths] - logits[:ths].max()))) - logits[:ths].max()
        ld = logits[ths:ths + nd]
        ld = ld - ld.max() - np.log(np.sum(np.exp(ld - ld.max())))
        total += float(lt[tok]) + float(ld[di])
    return total


def test_beam_beats_greedy_on_scripted_joint():
    cfg, joint_fn, pred_fn = _scripted()
    blank = cfg.blank_id
    enc = np.arange(2, dtype=np.float32)[:, None]

    greedy, _, _, _ = tdt_greedy_decode_host(
        enc, joint_fn, pred_fn, (blank,), np.array([blank], np.float32), blank,
        blank_id=blank, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values, max_symbols=4)
    assert greedy == [7], "script broken: greedy should take the myopic 7"

    hyps = tdt_beam_decode_host(
        enc, joint_fn, pred_fn, (blank,), np.array([blank], np.float32), blank,
        blank_id=blank, token_head_size=cfg.token_head_size,
        duration_values=cfg.duration_values, beam=3, expansion_k=3,
        max_symbols=4)
    assert hyps[0].tokens == [8], [h.tokens for h in hyps]
    by_tokens = {tuple(h.tokens): h.score for h in hyps}
    assert (7,) in by_tokens, "greedy's path must still be in the n-best"
    assert by_tokens[(8,)] > by_tokens[(7,)]
    # the beam's score matches independent path scoring of the dominant
    # alignment (final log-add recombination folds in the negligible mass
    # of the direct duration-2/3/4 alignments of the same sequence)
    want_8 = _path_score(cfg, joint_fn, [(0, blank, 8, 1), (1, 8, blank, 1)])
    assert by_tokens[(8,)] == pytest.approx(want_8, abs=5e-3)
    # n-best ordered and deduped
    scores = [h.score for h in hyps]
    assert scores == sorted(scores, reverse=True)
    assert len({tuple(h.tokens) for h in hyps}) == len(hyps)


def test_lm_shallow_fusion_steers_the_beam():
    """With near-tied acoustic evidence (7 slightly ahead of 8 at frame 0
    and identical continuations), an LM preferring 8 flips the beam's
    1-best."""
    cfg, joint_fn0, pred_fn = _scripted()
    blank, ths = cfg.blank_id, cfg.token_head_size

    def joint_fn(enc_t, g):
        logits = joint_fn0(enc_t, g)
        if int(enc_t[0]) == 0:
            logits[7], logits[8] = 2.0, 1.9   # 7 narrowly ahead
        if int(enc_t[0]) == 1 and int(g[0]) == 7:
            logits[:] = -5.0
            logits[blank] = 8.0               # continuation same as after 8
            logits[ths + 1] = 5.0
        return logits

    enc = np.arange(2, dtype=np.float32)[:, None]
    kw = dict(blank_id=blank, token_head_size=ths,
              duration_values=cfg.duration_values, beam=3, expansion_k=3,
              max_symbols=4)
    base = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                np.array([blank], np.float32), blank, **kw)
    assert base[0].tokens == [7]          # tie -> lower index, like greedy
    fused = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                 np.array([blank], np.float32), blank,
                                 lm_fn=lambda prefix, tok: 1.0 if tok == 8 else 0.0,
                                 lm_weight=1.0, **kw)
    assert fused[0].tokens == [8]


def test_batched_joint_equals_single(setup, rng):
    """joint_batch_fn (one device call per frontier) must reproduce the
    per-hypothesis path: same n-best tokens, scores to float tolerance."""
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state, prime_decode_state

    cfg, params = setup
    feats = (0.6 * rng.standard_normal((1, 150, cfg.feat_in))).astype(np.float32)
    enc_j, enc_len = offline_encode(params, cfg, feats, np.array([150], np.int32))
    enc = np.asarray(enc_j)[0, : int(np.asarray(enc_len)[0])]
    j_fn, p_fn = _jax_fns(cfg, params)

    def j_batch(enc_t, G):
        return np.asarray(joint_single_step(
            params["joint"],
            jnp.broadcast_to(enc_t[None], (G.shape[0], enc_t.shape[0])), G))

    ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
    kw = dict(blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
              duration_values=cfg.duration_values, beam=4, expansion_k=3,
              max_symbols=cfg.max_symbols_per_timestep)
    a = tdt_beam_decode_host(enc, j_fn, p_fn, (ds.h, ds.c),
                             np.asarray(ds.g)[0], cfg.blank_id, **kw)
    b = tdt_beam_decode_host(enc, j_fn, p_fn, (ds.h, ds.c),
                             np.asarray(ds.g)[0], cfg.blank_id,
                             joint_batch_fn=j_batch, **kw)
    assert [h.tokens for h in a] == [h.tokens for h in b]
    for ha, hb in zip(a, b):
        assert ha.score == pytest.approx(hb.score, abs=1e-4)


@pytest.mark.parametrize("suppress", [False, True])
def test_model_level_beam(setup, rng, suppress):
    """beam=1 == transcribe_offline under BOTH runtime configurations —
    including default leading-punct suppression (the runtime knobs must
    reach the beam, not just the greedy path)."""
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    model.runtime = RuntimeConfig(suppress_leading_punct=suppress)
    t = np.arange(24000)
    audio = (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
             + 0.1 * np.random.default_rng(2).standard_normal(24000)).astype(np.float32)

    nbest = model.transcribe_offline_beam(audio, beam=3, expansion_k=3)
    assert 1 <= len(nbest) <= 3
    scores = [s for _, _, s in nbest]
    assert scores == sorted(scores, reverse=True)
    # beam=1 reproduces the greedy offline transcript
    text_g, ids_g = model.transcribe_offline(audio)
    (text_b1, ids_b1, _), = model.transcribe_offline_beam(audio, beam=1)
    assert ids_b1 == ids_g and text_b1 == text_g

def test_contextual_biasing_steers_the_beam():
    """make_biasing_lm: a two-token phrase (7, 9) gets a per-token bonus,
    flipping the scripted case where acoustics prefer stopping at [7]
    (frame 1 after 7: blank 0.1 vs token 9 at 0.0)."""
    from trt_asr_tpu.decode.biasing import make_biasing_lm

    cfg, joint_fn, pred_fn = _scripted()
    blank = cfg.blank_id
    enc = np.arange(2, dtype=np.float32)[:, None]
    kw = dict(blank_id=blank, token_head_size=cfg.token_head_size,
              duration_values=cfg.duration_values, beam=3, expansion_k=3,
              max_symbols=4)
    base = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                np.array([blank], np.float32), blank, **kw)
    assert 9 not in base[0].tokens

    class TwoTok:
        def encode(self, text):
            assert text == "seventy-nine"
            return [7, 9]

    lm = make_biasing_lm(["seventy-nine"], TwoTok(), bonus=3.0)
    assert lm([], 7) == 3.0          # phrase start
    assert lm([7], 9) == 3.0         # continuation
    assert lm([8], 9) == 0.0         # no matched prefix
    assert lm([7], 8) == 0.0         # wrong continuation

    fused = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                 np.array([blank], np.float32), blank,
                                 lm_fn=lm, lm_weight=1.0, **kw)
    assert fused[0].tokens == [7, 9], [h.tokens for h in fused]


def test_biasing_lm_with_real_tokenizer():
    from trt_asr_tpu.decode.biasing import make_biasing_lm
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    tok = Tokenizer(make_synthetic_vocab(64))
    aa = tok.token_id("▁aa")
    assert aa >= 0
    lm = make_biasing_lm(["aa"], tok, bonus=2.5)
    assert lm([], aa) == 2.5
    assert lm([], aa + 1 if aa + 1 != tok.blank_id else aa + 2) == 0.0


def test_biasing_ignores_unrepresentable_phrases():
    """A phrase the vocab cannot encode (falls to <unk>) must be dropped:
    rewarding <unk> emissions would distort every score stream-wide."""
    from trt_asr_tpu.decode.biasing import make_biasing_lm
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    tok = Tokenizer(make_synthetic_vocab(64))
    unk = tok.token_id("<unk>")
    assert unk >= 0 and unk in tok.encode("@@@")
    lm = make_biasing_lm(["@@@", "zzzqqq"], tok, bonus=3.0)
    for t in range(len(tok.vocab)):
        assert lm([], t) == 0.0
    assert lm([unk], unk) == 0.0
