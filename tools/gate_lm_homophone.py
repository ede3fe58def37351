#!/usr/bin/env python3
"""LM-fusion / hotword-biasing value gate in a WORKING regime
(VERDICT r3 #4).

r3's LM measurement lived in a failing regime (80% -> 79% WER on a noisy
clean-trained toy — plumbing, not value). This gate constructs the
textbook domain-adaptation scenario synthetically, with the ambiguity the
LM must resolve built into the ACOUSTICS:

- the text vocabulary contains HOMOPHONE pairs — two distinct text words
  synthesized from the SAME acoustic class (identical audio), so no
  acoustic model can tell them apart, ever;
- the ASR model trains on a BROAD corpus: uniform random word order,
  both homophone spellings 50/50 — its predictor learns no contextual
  preference (a generic AM);
- the DOMAIN distribution determines each homophone by its preceding
  trigger word (spelling A only ever follows trigger 2i, spelling B only
  follows trigger 2i+1); the external n-gram LM is fitted on domain text
  only (decode/ngram_lm.py).

Greedy decoding therefore sits at a baseline WER set by the homophone
rate (~50% error on ambiguous tokens -> 10-30% overall: a regime users
actually run), and shallow fusion has REAL words to flip: the beam
carries both near-tied spellings and the LM scores the context. The
biasing arm plays the contacts-list story: an eval subset whose sentences
use only the B spellings, with the B words supplied as hotwords
(decode/biasing.py).

    python tools/gate_lm_homophone.py --out-dir /tmp/gate_homophone
        [--steps 1000] [--train-utts 1200] [--eval-utts 40]
        [--artifact artifacts/e2e_wer_gate_lm_homophone.json]

Verdict (exit 0 iff all hold):
- greedy baseline WER in [0.05, 0.35] (the working regime);
- beam+LM at the best fused weight improves >= 3 WER points absolute;
- biasing improves its subset >= 3 points.

GRADED-AMBIGUITY MODE (VERDICT r4 #7, ``--graded``): the identical-audio
construction above can only show the LM winning — acoustics carry zero
signal, so fusion weight has no cost side. ``--graded`` sweeps a morph
knob alpha: a B spelling's audio becomes
``(1-alpha) * wav(class_A) + alpha * wav(distinct_class_B)`` in BOTH the
training corpus and the eval set, so at alpha=0 the pair is a true
homophone and at alpha=0.5 the AM has learned real separability. The
domain rule is made NOISY (``--rule-break``: the spelling contradicts its
trigger that fraction of the time, in LM-fit text and eval alike), so an
over-weighted LM overrides correct acoustic evidence on rule-breaking
slots — the measurable cost the identical-audio gate cannot produce.
Output: the WER surface over alpha x lm_weight + a recommended default
weight (best mean WER across the alpha grid), written to
``--graded-artifact``.

    python tools/gate_lm_homophone.py --graded --out-dir /tmp/gate_graded
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from train_synthetic_e2e import make_words, synth_utterance, synth_word  # noqa: E402

N_UNIQ = 140          # unambiguous words: text id == acoustic class
N_PAIRS = 30          # homophone pairs: ids 140..169 (A) / 170..199 (B)
N_TEXT = N_UNIQ + 2 * N_PAIRS
P_HOMOPHONE = 0.45    # domain: probability a slot is a trigger+homophone
SR = 16000


def acoustic_class(tid: int) -> int:
    return tid - N_PAIRS if tid >= N_UNIQ + N_PAIRS else tid


def broad_sentence(r) -> list:
    k = int(r.integers(4, 8))
    return list(r.integers(0, N_TEXT, size=k))


def domain_sentence(r, force_b: bool = False, rule_break: float = 0.0) -> list:
    """Trigger-ruled text: homophone i's spelling A follows trigger 2i,
    spelling B follows trigger 2i+1. force_b: every homophone is a B
    spelling (the biasing subset). rule_break: fraction of slots whose
    spelling CONTRADICTS the trigger (graded mode) — the LM then prefers
    the wrong spelling there and fusion weight has a measurable cost."""
    out = []
    slots = int(r.integers(2, 4))
    for _ in range(slots):
        if r.random() < P_HOMOPHONE:
            i = int(r.integers(0, N_PAIRS))
            b = True if force_b else bool(r.integers(0, 2))
            out.append(2 * i + (1 if b else 0))          # the trigger
            if rule_break and r.random() < rule_break:
                b = not b                                # spelling defies rule
            out.append(N_UNIQ + N_PAIRS * b + i)         # the homophone
        else:
            out.append(int(r.integers(0, N_UNIQ)))
    return out


def synth_text_morph(tids, r, alpha: float) -> np.ndarray:
    """synth_utterance with graded B-spelling acoustics: a B token's
    waveform is the alpha-mix of its pair's class-A signature and an
    otherwise-unused distinct band code (class N_TEXT + i — valid:
    synth_word supports 1120 classes, all < 560 share the 0.30 s duration
    bit, so the two waveforms align sample-for-sample). alpha=0
    reproduces the identical-audio homophone gate exactly."""
    if alpha <= 0.0:
        return synth_utterance([acoustic_class(t) for t in tids], r)
    gap = np.zeros(int(0.08 * SR), np.float32)
    parts = [gap.copy()]
    for t in tids:
        if t >= N_UNIQ + N_PAIRS:
            i = t - (N_UNIQ + N_PAIRS)
            wa = synth_word(N_UNIQ + i, r)
            wb = synth_word(N_TEXT + i, r)
            parts.append(((1.0 - alpha) * wa + alpha * wb)
                         .astype(np.float32))
        else:
            parts.append(synth_word(acoustic_class(t), r))
        parts.append(gap.copy())
    parts.append(np.zeros(int(0.6 * SR), np.float32))
    return np.concatenate(parts)


def run_graded(args, words, synth_text, train_model) -> int:
    """The alpha x lm_weight WER surface (module docstring): one model per
    morph alpha, eval TEXTS shared across alphas (paired comparison, same
    rng seed), LM fit once on the noisy-rule domain text. The recommended
    default lm_weight is the best mean WER across the alpha grid; the
    artifact also lists, per alpha, every weight that HURTS vs the unfused
    beam — the cost side the identical-audio gate cannot measure."""
    from trt_asr_tpu.config import RuntimeConfig
    from trt_asr_tpu.decode.ngram_lm import fit_from_text
    from trt_asr_tpu.eval.wer import score_corpus
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
    from trt_asr_tpu.streaming.session import StreamingSession

    alphas = [float(x) for x in args.alphas.split(",")]
    weights = [float(x) for x in args.graded_weights.split(",")]
    rt = RuntimeConfig(suppress_leading_punct=False)

    r = np.random.default_rng(5)
    corpus = [" ".join(words[t] for t in
                       domain_sentence(r, rule_break=args.rule_break))
              for _ in range(args.lm_utts)]

    surface = {}
    lm = None
    t_start = time.time()
    for alpha in alphas:
        mdir = os.path.join(args.out_dir, f"model_a{alpha:g}")
        train_model(mdir, alpha)
        model = ParakeetTDT.from_model_dir(mdir, runtime=rt)
        if lm is None:
            lm = fit_from_text(corpus, model.tokenizer, order=3)
            lm.save(os.path.join(args.out_dir, "domain_lm_graded.json"))
        re = np.random.default_rng(9)
        evals = [domain_sentence(re, rule_break=args.rule_break)
                 for _ in range(args.eval_utts)]
        wavs = [synth_text(s, re, alpha) for s in evals]

        def run(make_sess):
            pairs = []
            for s, a in zip(evals, wavs):
                sess = make_sess()
                sess.push_audio(a)
                sess.finalize()
                pairs.append((" ".join(words[t] for t in s), sess.text))
            return score_corpus(pairs)["wer"]

        row = {"greedy": run(lambda: StreamingSession(model, rt)),
               "beam": run(lambda: BeamStreamingSession(
                   model, beam=args.beam, runtime=rt))}
        for w in weights:
            row[f"lm{w:g}"] = run(lambda: BeamStreamingSession(
                model, beam=args.beam, lm_fn=lm, lm_weight=w, runtime=rt))
        surface[f"{alpha:g}"] = row
        print(f"alpha={alpha:g}: "
              + " ".join(f"{k}={v*100:.2f}%" for k, v in row.items())
              + f" ({time.time()-t_start:.0f}s)", flush=True)

    mean_by_w = {w: float(np.mean([surface[f"{a:g}"][f"lm{w:g}"]
                                   for a in alphas])) for w in weights}
    best_w = min(mean_by_w, key=mean_by_w.get)
    hurts = {f"{a:g}": [w for w in weights
                        if surface[f"{a:g}"][f"lm{w:g}"]
                        > surface[f"{a:g}"]["beam"] + 1e-9]
             for a in alphas}
    verdict = {
        "rule_break": args.rule_break,
        "surface_wer": surface,
        "mean_wer_by_weight": {f"{w:g}": v for w, v in mean_by_w.items()},
        "recommended_lm_weight": best_w,
        "weights_that_hurt_by_alpha": hurts,
        "cost_side_measurable": any(v for v in hurts.values()),
    }
    print(json.dumps(verdict, indent=1))
    os.makedirs(os.path.dirname(args.graded_artifact) or ".", exist_ok=True)
    with open(args.graded_artifact, "w") as f:
        json.dump({"config": vars(args), "verdict": verdict}, f, indent=1)
    print(f"wrote {args.graded_artifact}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", default="/tmp/gate_homophone")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--train-utts", type=int, default=1200)
    ap.add_argument("--eval-utts", type=int, default=40)
    ap.add_argument("--lm-utts", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--beam", type=int, default=4)
    ap.add_argument("--lm-weights", default="0.3,0.6")
    ap.add_argument("--bias-bonus", type=float, default=3.0)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--artifact",
                    default="artifacts/e2e_wer_gate_lm_homophone.json")
    ap.add_argument("--graded", action="store_true",
                    help="WER surface over alpha x lm_weight (module "
                         "docstring): one model per alpha, noisy domain "
                         "rule, recommended default weight")
    ap.add_argument("--alphas", default="0,0.25,0.5")
    ap.add_argument("--rule-break", type=float, default=0.15)
    ap.add_argument("--graded-weights", default="0.15,0.3,0.6,1.0,2.0")
    ap.add_argument("--graded-artifact",
                    default="artifacts/e2e_wer_gate_lm_graded.json")
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()

    import jax
    import optax

    from trt_asr_tpu.config import ModelConfig, RuntimeConfig
    from trt_asr_tpu.contract import FrontendSpec
    from trt_asr_tpu.decode.biasing import make_biasing_lm
    from trt_asr_tpu.decode.ngram_lm import fit_from_text
    from trt_asr_tpu.eval.wer import score_corpus
    from trt_asr_tpu.frontend import LogMelFrontend
    from trt_asr_tpu.models.parakeet import init_params
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.beam_session import BeamStreamingSession
    from trt_asr_tpu.streaming.session import StreamingSession
    from trt_asr_tpu.tokenizer import Tokenizer
    from trt_asr_tpu.train import make_train_step
    from trt_asr_tpu.train.train_step import Batch

    os.makedirs(args.out_dir, exist_ok=True)
    words = make_words(N_TEXT)
    cfg = ModelConfig.tiny(feat_in=32, num_layers=2, d_model=64, n_heads=4,
                           subsampling_conv_channels=16, vocab_size=N_TEXT,
                           pred_hidden=32, joint_hidden=32, att_cache_size=64)
    tokenizer = Tokenizer(["▁" + w for w in words], blank_id=cfg.blank_id)
    frontend = LogMelFrontend(FrontendSpec(n_mels=cfg.feat_in))

    def synth_text(tids, r, alpha: float = 0.0):
        return synth_text_morph(tids, r, alpha)

    def train_model(mdir: str, alpha: float):
        """Broad (generic-AM) training corpus — uniform random text, B
        spellings synthesized at the given acoustic morph alpha."""
        if args.skip_train and os.path.isdir(mdir):
            return
        r = np.random.default_rng(1)
        train = [(s, synth_text(s, r, alpha))
                 for s in (broad_sentence(r) for _ in range(args.train_utts))]
        feats_list = [np.asarray(frontend(a)) for _, a in train]
        max_t = max(f.shape[0] for f in feats_list)
        max_u = max(len(s) for s, _ in train)
        n = len(train)
        feats = np.zeros((n, max_t, cfg.feat_in), np.float32)
        feat_len = np.zeros((n,), np.int32)
        labels = np.zeros((n, max_u), np.int32)
        label_len = np.zeros((n,), np.int32)
        for i, ((s, _), f) in enumerate(zip(train, feats_list)):
            feats[i, : f.shape[0]] = f
            feat_len[i] = f.shape[0]
            labels[i, : len(s)] = s
            label_len[i] = len(s)

        params = init_params(cfg, seed=0)
        opt = optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps),
                          weight_decay=1e-4)
        init_opt, train_step = make_train_step(cfg, opt, streaming=True)
        step = jax.jit(train_step, donate_argnums=(0, 1))
        opt_state = init_opt(params)
        rng = np.random.default_rng(0)
        bs = 16
        t0 = time.time()
        for it in range(args.steps):
            sel = rng.integers(0, n, size=bs)
            batch = Batch(feats[sel], feat_len[sel], labels[sel],
                          label_len[sel])
            params, opt_state, metrics = step(params, opt_state, batch)
            if it % 100 == 0 or it == args.steps - 1:
                print(f"[alpha={alpha:g}] step {it}: loss "
                      f"{float(metrics['loss']):.3f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        model = ParakeetTDT(cfg, jax.device_get(params), tokenizer)
        model.save_model_dir(mdir)

    if args.graded:
        return run_graded(args, words, synth_text, train_model)

    mdir = os.path.join(args.out_dir, "model")
    train_model(mdir, 0.0)
    model = ParakeetTDT.from_model_dir(mdir, runtime=RuntimeConfig())

    # ---- domain LM (text only) ----
    r = np.random.default_rng(5)
    corpus = [" ".join(words[t] for t in domain_sentence(r))
              for _ in range(args.lm_utts)]
    lm = fit_from_text(corpus, model.tokenizer, order=3)
    lm.save(os.path.join(args.out_dir, "domain_lm.json"))

    # ---- held-out domain eval sets ----
    re = np.random.default_rng(9)
    evals = [domain_sentence(re) for _ in range(args.eval_utts)]
    evals_b = [domain_sentence(re, force_b=True)
               for _ in range(args.eval_utts // 2)]
    wavs = [synth_text(s, re) for s in evals]
    wavs_b = [synth_text(s, re) for s in evals_b]

    def transcribe(make_sess, sents, audios):
        pairs = []
        for s, a in zip(sents, audios):
            sess = make_sess()
            sess.push_audio(a)
            sess.finalize()
            pairs.append((" ".join(words[t] for t in s), sess.text))
        return score_corpus(pairs)

    rt = RuntimeConfig(suppress_leading_punct=False)
    rows = {}
    t0 = time.time()
    rows["greedy"] = transcribe(lambda: StreamingSession(model, rt),
                                evals, wavs)
    rows["beam"] = transcribe(
        lambda: BeamStreamingSession(model, beam=args.beam, runtime=rt),
        evals, wavs)
    for w in (float(x) for x in args.lm_weights.split(",")):
        rows[f"beam_lm{w:g}"] = transcribe(
            lambda: BeamStreamingSession(model, beam=args.beam, lm_fn=lm,
                                         lm_weight=w, runtime=rt),
            evals, wavs)
    # biasing subset: B spellings as hotwords (a contacts-list analog)
    b_words = [words[N_UNIQ + N_PAIRS + i] for i in range(N_PAIRS)]
    rows["subsetB_beam"] = transcribe(
        lambda: BeamStreamingSession(model, beam=args.beam, runtime=rt),
        evals_b, wavs_b)
    rows["subsetB_beam_bias"] = transcribe(
        lambda: BeamStreamingSession(
            model, beam=args.beam, runtime=rt,
            lm_fn=make_biasing_lm(b_words, model.tokenizer,
                                  bonus=args.bias_bonus), lm_weight=1.0),
        evals_b, wavs_b)
    for k, v in rows.items():
        print(f"{k:20s}: WER {v['wer']*100:6.2f}% (S={v['substitutions']} "
              f"I={v['insertions']} D={v['deletions']})", flush=True)
    print(f"eval wall: {time.time()-t0:.0f}s", flush=True)

    base = rows["greedy"]["wer"]
    fused = {k: v["wer"] for k, v in rows.items() if k.startswith("beam_lm")}
    best_label = min(fused, key=fused.get)
    verdict = {
        "baseline_in_working_regime": 0.05 <= base <= 0.35,
        "greedy_wer": base,
        "beam_unfused_wer": rows["beam"]["wer"],
        "best_fused": {"label": best_label, "wer": fused[best_label]},
        "lm_abs_improvement_vs_greedy": base - fused[best_label],
        "lm_improves_3pts": base - fused[best_label] >= 0.03,
        "bias_subset_unbiased_wer": rows["subsetB_beam"]["wer"],
        "bias_subset_biased_wer": rows["subsetB_beam_bias"]["wer"],
        "bias_abs_improvement": rows["subsetB_beam"]["wer"]
        - rows["subsetB_beam_bias"]["wer"],
        "bias_improves_3pts": (rows["subsetB_beam"]["wer"]
                               - rows["subsetB_beam_bias"]["wer"]) >= 0.03,
    }
    ok = (verdict["baseline_in_working_regime"]
          and verdict["lm_improves_3pts"] and verdict["bias_improves_3pts"])
    print(json.dumps(verdict, indent=1))
    if args.artifact:
        os.makedirs(os.path.dirname(args.artifact) or ".", exist_ok=True)
        with open(args.artifact, "w") as f:
            json.dump({"config": {k: v for k, v in vars(args).items()},
                       "profile": {"n_text": N_TEXT, "n_pairs": N_PAIRS,
                                   "p_homophone": P_HOMOPHONE},
                       "rows": {k: {kk: v[kk] for kk in
                                    ("wer", "substitutions", "insertions",
                                     "deletions", "ref_words")}
                                for k, v in rows.items()},
                       "verdict": verdict}, f, indent=1)
        print(f"wrote {args.artifact}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
