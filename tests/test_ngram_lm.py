"""N-gram LM for shallow fusion (decode/ngram_lm.py): stupid-backoff math,
persistence, tokenizer training path, and end-to-end fusion through the
scripted beam (the concrete lm_fn instance for decode/beam.py's hook —
the reference has no LM machinery at all)."""

import math

import numpy as np
import pytest

from trt_asr_tpu.decode.ngram_lm import BOS, NGramLM, fit_from_text


def test_backoff_math_exact():
    lm = NGramLM.fit([[1, 2, 3], [1, 2, 4]], order=3, vocab_size=8, alpha=0.4)
    # seen trigram: P(3 | 1,2) = 1/2
    assert lm.prob([1, 2], 3) == pytest.approx(0.5)
    assert lm.prob([1, 2], 4) == pytest.approx(0.5)
    # unseen under (1,2) -> backoff to (2,) (also unseen) -> unigram add-1:
    # alpha^2 * (count(5)+1)/(total+V+1); unigrams: 1x2,2x2,3,4 -> total 6
    assert lm.prob([1, 2], 5) == pytest.approx(0.4 * 0.4 * 1 / (6 + 8 + 1))
    # sentence-start context counts: P(1 | BOS,BOS) = 1 (both sentences)
    assert lm.prob([BOS, BOS], 1) == pytest.approx(1.0)
    # score() pads BOS itself
    assert lm.score([], 1) == pytest.approx(0.0)  # log 1


def test_in_domain_scores_higher():
    rng = np.random.default_rng(0)
    seqs = [[1, 2, 3, 4, 5]] * 20 + [list(rng.integers(1, 10, 5)) for _ in range(5)]
    lm = NGramLM.fit(seqs, order=3)
    assert lm.sentence_logp([1, 2, 3, 4, 5]) > lm.sentence_logp([5, 4, 3, 2, 1])


def test_save_load_roundtrip(tmp_path):
    lm = NGramLM.fit([[1, 2, 3], [2, 3, 1, 2]], order=2, vocab_size=16)
    p = tmp_path / "lm.json"
    lm.save(str(p))
    lm2 = NGramLM.load(str(p))
    for ctx in ([], [1], [1, 2], [3, 1]):
        for t in range(5):
            assert lm.score(ctx, t) == pytest.approx(lm2.score(ctx, t))


def test_fit_from_text_uses_tokenizer():
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    tok = Tokenizer(make_synthetic_vocab(64), blank_id=64)
    lm = fit_from_text(["aba bab", "aba aba"], tok, order=2)
    seq = tok.encode("aba")
    assert seq  # encoding produced tokens
    assert lm.sentence_logp(seq) > -1e9
    assert lm.vocab_size == 64


def test_beam_fusion_flips_near_tie():
    """Same scripted near-tie as test_beam's lm_fn test: an NGramLM trained
    to prefer token 8 must flip the beam's choice from 7 to 8."""
    from tests.test_beam import _scripted
    from trt_asr_tpu.decode.beam import tdt_beam_decode_host

    cfg, joint_fn0, pred_fn = _scripted()
    blank, ths = cfg.blank_id, cfg.token_head_size

    def joint_fn(enc_t, g):
        logits = joint_fn0(enc_t, g)
        if int(enc_t[0]) == 0:
            logits[7], logits[8] = 2.0, 1.9
        if int(enc_t[0]) == 1 and int(g[0]) == 7:
            logits[:] = -5.0
            logits[blank] = 8.0
            logits[ths + 1] = 5.0
        return logits

    enc = np.arange(2, dtype=np.float32)[:, None]
    kw = dict(blank_id=blank, token_head_size=ths,
              duration_values=cfg.duration_values, beam=3, expansion_k=3,
              max_symbols=4)
    base = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                np.array([blank], np.float32), blank, **kw)
    assert base[0].tokens == [7]
    lm = NGramLM.fit([[8]] * 50 + [[7]], order=2, vocab_size=ths)
    margin = lm.score([], 8) - lm.score([], 7)
    fused = tdt_beam_decode_host(enc, joint_fn, pred_fn, (blank,),
                                 np.array([blank], np.float32), blank,
                                 lm_fn=lm, lm_weight=0.2 / margin, **kw)
    assert fused[0].tokens == [8]
