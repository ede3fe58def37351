#!/usr/bin/env python3
"""End-to-end WER gate demonstration on a synthetic spoken-words task.

The reference never achieved a passing WER gate (its VALIDATION_REPORT_WER:
100% / 98.23% WER, mostly-empty transcripts). This tool proves OUR full
pipeline end to end: synthesize a vocabulary of distinct audio "words" ->
extract features with the production frontend -> train the Parakeet-TDT
model with the TDT loss -> save a model dir -> transcribe HELD-OUT
utterances through the real eval suite (CLI protocol) -> score WER.

    python tools/train_synthetic_e2e.py --out-dir /tmp/e2e --steps 300
    # then: suite + WER run automatically; expect WER ~0 on held-out data
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
         "india", "julia", "kilo", "lima"]


def synth_word(word_idx: int, rng, sr=16000) -> np.ndarray:
    """0.30 s tone chord unique per word + noise floor."""
    dur = int(0.30 * sr)
    t = np.arange(dur) / sr
    f0 = 220.0 * (2 ** (word_idx / 3.0))
    x = (0.35 * np.sin(2 * np.pi * f0 * t)
         + 0.18 * np.sin(2 * np.pi * f0 * 1.5 * t)
         + 0.02 * rng.standard_normal(dur))
    env = np.minimum(np.arange(dur), dur - np.arange(dur)) / (0.02 * sr)
    return (x * np.clip(env, 0, 1)).astype(np.float32)


def synth_utterance(word_ids, rng, sr=16000) -> np.ndarray:
    gap = np.zeros(int(0.08 * sr), np.float32)
    parts = [gap.copy()]
    for w in word_ids:
        parts.append(synth_word(w, rng))
        parts.append(gap.copy())
    return np.concatenate(parts)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--train-utts", type=int, default=96)
    ap.add_argument("--eval-utts", type=int, default=12)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--gate-wer", type=float, default=0.05)
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)
    import optax

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.contract import FrontendSpec
    from trt_asr_tpu.frontend import LogMelFrontend
    from trt_asr_tpu.io.wav import save_wav
    from trt_asr_tpu.models.parakeet import init_params
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.tokenizer import Tokenizer
    from trt_asr_tpu.train import make_train_step
    from trt_asr_tpu.train.train_step import Batch

    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    cfg = ModelConfig.tiny(feat_in=32, num_layers=2, d_model=64, n_heads=4,
                           subsampling_conv_channels=16, vocab_size=len(WORDS),
                           pred_hidden=32, joint_hidden=32, att_cache_size=64)
    vocab = ["▁" + w for w in WORDS]
    tokenizer = Tokenizer(vocab, blank_id=cfg.blank_id)
    frontend = LogMelFrontend(FrontendSpec(n_mels=cfg.feat_in))

    # ---- dataset ----
    def make_set(n, seed):
        r = np.random.default_rng(seed)
        utts = []
        for _ in range(n):
            k = int(r.integers(2, 5))
            ids = list(r.integers(0, len(WORDS), size=k))
            utts.append((ids, synth_utterance(ids, r)))
        return utts

    train = make_set(args.train_utts, 1)
    evals = make_set(args.eval_utts, 2)

    max_u = max(len(ids) for ids, _ in train)
    feats_list = [np.asarray(frontend(a)) for _, a in train]
    max_t = max(f.shape[0] for f in feats_list)
    b_all = len(train)
    feats = np.zeros((b_all, max_t, cfg.feat_in), np.float32)
    feat_len = np.zeros((b_all,), np.int32)
    labels = np.zeros((b_all, max_u), np.int32)
    label_len = np.zeros((b_all,), np.int32)
    for i, ((ids, _), f) in enumerate(zip(train, feats_list)):
        feats[i, : f.shape[0]] = f
        feat_len[i] = f.shape[0]
        labels[i, : len(ids)] = ids
        label_len[i] = len(ids)

    # ---- train ----
    params = init_params(cfg, seed=0)
    sched = optax.cosine_decay_schedule(args.lr, args.steps)
    init_opt, train_step = make_train_step(cfg, optax.adam(sched))
    step = jax.jit(train_step, donate_argnums=(0, 1))
    opt_state = init_opt(params)
    bs = 16
    import time

    t0 = time.time()
    for i in range(args.steps):
        sel = rng.integers(0, b_all, size=bs)
        batch = Batch(feats[sel], feat_len[sel], labels[sel], label_len[sel])
        params, opt_state, m = step(params, opt_state, batch)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(f"step {i:4d}: loss {float(np.asarray(m['loss'])):8.4f}", flush=True)
    print(f"trained in {time.time()-t0:.0f}s")

    # ---- save model dir ----
    model = ParakeetTDT(cfg, params, tokenizer, frontend=frontend)
    mdir = os.path.join(args.out_dir, "model")
    model.save_model_dir(mdir)

    # ---- held-out wavs + manifest ----
    from trt_asr_tpu.eval.manifest import ManifestEntry, write_manifest

    entries = []
    wav_dir = os.path.join(args.out_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    for i, (ids, audio) in enumerate(evals):
        p = os.path.join(wav_dir, f"utt{i}.wav")
        save_wav(p, audio)
        entries.append(ManifestEntry(p, " ".join(WORDS[k] for k in ids)))
    man = os.path.join(args.out_dir, "eval.tsv")
    write_manifest(man, entries)

    # ---- run the real suite (CLI protocol) on held-out data ----
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite

    res = run_suite(SuiteConfig(
        manifest_path=man, out_dir=os.path.join(args.out_dir, "suite"),
        model_dir=mdir, engine="python", variants=["base"], rounds=1,
        stream_sim=0.5, feature_norm="none"))
    wer = res["variants"]["base"][0]["wer"]
    print(f"HELD-OUT WER: {wer['wer']*100:.2f}% "
          f"(S={wer['substitutions']} I={wer['insertions']} D={wer['deletions']} "
          f"N={wer['ref_words']}; empty={wer['empty_hypotheses']})")
    for u in res["variants"]["base"][0]["utterances"][:4]:
        print(f"  ref: {u['reference']!r}\n  hyp: {u['transcript']!r}")
    if wer["wer"] > args.gate_wer:
        print(f"WER GATE FAIL ({wer['wer']:.3f} > {args.gate_wer})")
        return 1
    print(f"WER GATE PASS ({wer['wer']*100:.2f}% <= {args.gate_wer*100:.0f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
