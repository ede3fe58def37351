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
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CONS = ["b", "d", "f", "g", "h", "j", "k", "l", "m", "n",
         "p", "r", "s", "t", "v", "w", "z", "ch", "sh", "th"]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "oo", "ei", "ou", "ia"]


def make_words(n: int):
    """n distinct pronounceable CVCV words (20x10 pairs -> up to 40000)."""
    words = []
    i = 0
    while len(words) < n:
        c1, v1 = _CONS[i % 20], _VOWELS[(i // 20) % 10]
        c2, v2 = _CONS[(i // 200) % 20], _VOWELS[(i // 4000) % 10]
        words.append(c1 + v1 + c2 + v2)
        i += 1
    return words


_N_BANDS = 16
_BANDS = [200.0 * (2 ** (i * 5.23 / _N_BANDS)) for i in range(_N_BANDS)]
# 200 Hz .. ~7.5 kHz, log-spaced: adjacent bands ~150 mel apart -> >=2 mel
# bins of separation at 32 bins, so every band is individually resolvable.
_N_COMBOS = 560                                   # C(16, 3)


def _combo_3_of_n(idx: int, n: int = _N_BANDS):
    """Unrank idx into the idx-th 3-element subset of range(n)."""
    from math import comb

    out, prev = [], -1
    k = 3
    for _ in range(3):
        c = prev + 1
        while comb(n - 1 - c, k - 1) <= idx:
            idx -= comb(n - 1 - c, k - 1)
            c += 1
        out.append(c)
        prev = c
        k -= 1
    return out


def synth_word(word_idx: int, rng, sr=16000) -> np.ndarray:
    """Acoustic signature unique per word: a DTMF-style 3-of-16
    frequency-band code (560 combos), doubled by a duration bit (0.30 s vs
    0.42 s) for word_idx >= 560 — 1120 cleanly separable classes at 32 mel
    bins (VERDICT r2 #6: >=1k vocabulary)."""
    dur = int((0.42 if word_idx >= _N_COMBOS else 0.30) * sr)
    t = np.arange(dur) / sr
    bands = _combo_3_of_n(word_idx % _N_COMBOS)
    x = 0.02 * rng.standard_normal(dur)
    for j, bi in enumerate(bands):
        x = x + (0.30 - 0.05 * j) * np.sin(2 * np.pi * _BANDS[bi] * t)
    env = np.minimum(np.arange(dur), dur - np.arange(dur)) / (0.02 * sr)
    return (x * np.clip(env, 0, 1)).astype(np.float32)


def synth_utterance(word_ids, rng, sr=16000, tail_s=0.6) -> np.ndarray:
    """tail_s trailing silence >= one steady chunk (57 frames = 0.57 s):
    streaming-consistent training emulates only STEADY chunks, so the
    serving-side finalize flush (which re-emits the tail from a different
    window alignment) must land entirely in silence."""
    gap = np.zeros(int(0.08 * sr), np.float32)
    parts = [gap.copy()]
    for w in word_ids:
        parts.append(synth_word(w, rng))
        parts.append(gap.copy())
    parts.append(np.zeros(int(tail_s * sr), np.float32))
    return np.concatenate(parts)


def make_set(n, seed, words, w_lo, w_hi):
    """Deterministic utterance set; seed=1 is the training set, seed=2 the
    held-out eval set. Shared with tools/gate_onnx_surface.py so the 4th
    gate surface replays the EXACT same held-out utterances — any change to
    the sampling here changes all surfaces together."""
    r = np.random.default_rng(seed)
    utts = []
    for i in range(n):
        k = int(r.integers(w_lo, w_hi))
        # guarantee full vocabulary coverage across the training set
        forced = (i * 3) % len(words)
        ids = [forced] + list(r.integers(0, len(words), size=k - 1))
        utts.append((ids, synth_utterance(ids, r)))
    return utts


def add_noise(audio: np.ndarray, snr_db: float, rng) -> np.ndarray:
    """Additive white noise at the given SNR."""
    p_sig = float(np.mean(audio ** 2)) + 1e-12
    p_noise = p_sig / (10.0 ** (snr_db / 10.0))
    return (audio + rng.standard_normal(audio.shape).astype(np.float32)
            * np.sqrt(p_noise)).astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--train-utts", type=int, default=96)
    ap.add_argument("--eval-utts", type=int, default=12)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--weight-decay", type=float, default=0.0,
                    help="decoupled weight decay (optax.adamw); >0 switches "
                         "the optimizer from adam to adamw. The hardened "
                         "gate (1120 vocab, 8-13 words) needs generalization "
                         "pressure: at 500 train utts the tiny model "
                         "memorizes sequences (train loss 0.12, held-out WER "
                         "99.6%) — the fix is 8x data + weight decay")
    ap.add_argument("--streaming-train", action="store_true",
                    help="train through the serving chunk schedule "
                         "(train_step.streaming_encode_train) instead of the "
                         "offline full-context encoder. REQUIRED for long "
                         "utterances: offline-trained models degrade "
                         "word-by-word under streaming's limited-context "
                         "attention (measured: held-out loss 0.23 but 84% "
                         "streaming WER at 8-13 words). Matches serving "
                         "to float precision per steady chunk")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder activations on backward "
                         "(jax.checkpoint over the layer scan, plus the "
                         "chunk scan under --streaming-train): identical "
                         "gradients, O(1) activation memory, ~1 extra "
                         "forward of compute — the big-batch/long-utterance "
                         "HBM lever (tests/test_training.py pins both)")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--gate-wer", type=float, default=0.05)
    ap.add_argument("--vocab-size", type=int, default=200,
                    help="synthetic vocabulary size (VERDICT r1 #10: >=200)")
    ap.add_argument("--noise-snr-db", type=float, default=15.0,
                    help="also evaluate a noisy copy of the held-out set at "
                         "this SNR (<=0 disables)")
    ap.add_argument("--train-noise-snr-db", type=float, default=0.0,
                    help="append noisy copies of half the training set at "
                         "this SNR; <=0 (default) trains clean only. "
                         "Measured: the tiny gate model lacks capacity for "
                         "noise-robust 200-word training — ANY train noise "
                         "costs held-out clean WER (clean-only 3.1%%, "
                         "replace-half 59%%, append-half 44%%), so the gate "
                         "criterion stays clean/base and the noisy eval row "
                         "is reported as an informational condition")
    ap.add_argument("--spec-augment", action="store_true",
                    help="train with SpecAugment (train/augment.py; freq "
                         "masks scaled to n_mels, adaptive time masks) — "
                         "the augmentation is inside the train step, the "
                         "eval/serving path never sees it. NOTE: on this "
                         "synthetic tone-memorization corpus augmentation "
                         "slows convergence rather than adding robustness "
                         "(600 steps: 25%% clean baseline vs 91%% with "
                         "masks — same capacity ceiling the "
                         "--train-noise-snr-db note documents); the flag "
                         "exists to exercise the full training path, not "
                         "to improve the toy gate")
    ap.add_argument("--stream-sims", default="0.3,0.5,1.0",
                    help="comma list of --stream-sim granularities; the "
                         "transcript must be invariant to push granularity")
    ap.add_argument("--words-per-utt", default="2,5",
                    help="lo,hi(exclusive) words per utterance; the hardened "
                         "gate uses 8,13 (>=5 s audio, many steady chunks, "
                         "att-cache saturation)")
    ap.add_argument("--surfaces", default="python",
                    help="comma list of serving surfaces the gate must pass "
                         "on: python (StreamingSession), batch "
                         "(BatchStreamingEngine, staggered attach/finalize), "
                         "native (C++ CLI, fast-mode env). VERDICT r2 #6")
    ap.add_argument("--batch-size", type=int, default=4,
                    help="slots for the batch surface")
    ap.add_argument("--native-cli", default="cpp/build/trt_asr_cli")
    ap.add_argument("--native-eval-utts", type=int, default=12,
                    help="the native surface re-imports jax + compiles per "
                         "subprocess (~1 min/utterance on this host): gate "
                         "it on the first N held-out utterances")
    ap.add_argument("--native-variants", default="base")
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--joint-hidden", type=int, default=32)
    ap.add_argument("--variants", default="base,nopunct,nocache,nocache_nopunct")
    ap.add_argument("--sabotage", default="",
                    help="fault injection for gate-sensitivity proof (e.g. "
                         "drop_time_carry): the gate must FAIL under it")
    ap.add_argument("--artifact", default="",
                    help="write the full suite-matrix JSON here")
    ap.add_argument("--train-state-every", type=int, default=0,
                    help="checkpoint params+optimizer to <out-dir>/"
                         "train_state every N steps (0=off); resume a "
                         "killed run with --resume-train-state")
    ap.add_argument("--resume-train-state", action="store_true",
                    help="resume from <out-dir>/train_state if present "
                         "(bitwise: the batch-selection rng stream is "
                         "fast-forwarded to the saved step)")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse <out-dir>/model from a previous run (for "
                         "sabotage/ablation passes)")
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
    words = make_words(args.vocab_size)

    cfg = ModelConfig.tiny(feat_in=32, num_layers=2, d_model=args.d_model,
                           n_heads=4, subsampling_conv_channels=16,
                           vocab_size=len(words), pred_hidden=32,
                           joint_hidden=args.joint_hidden, att_cache_size=64)
    vocab = ["▁" + w for w in words]
    tokenizer = Tokenizer(vocab, blank_id=cfg.blank_id)
    frontend = LogMelFrontend(FrontendSpec(n_mels=cfg.feat_in))

    # ---- dataset ----
    w_lo, w_hi = (int(x) for x in args.words_per_utt.split(","))

    train = make_set(args.train_utts, 1, words, w_lo, w_hi)
    evals = make_set(args.eval_utts, 2, words, w_lo, w_hi)
    if args.train_noise_snr_db > 0:
        # augment by APPENDING noisy copies — replacing half the clean set
        # in place pushed the tiny model into memorization (train loss 0.11
        # but held-out clean WER 59-62%; with all clean examples kept the
        # gate passes clean at 3% AND gains noise robustness)
        arng = np.random.default_rng(7)
        train = train + [(ids, add_noise(a, args.train_noise_snr_db, arng))
                         for ids, a in train[::2]]

    mdir = os.path.join(args.out_dir, "model")
    if args.skip_train:
        if not os.path.isdir(mdir):
            print(f"--skip-train: no model at {mdir}")
            return 2
        return _evaluate(args, words, evals, mdir)

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
    opt = (optax.adamw(sched, weight_decay=args.weight_decay)
           if args.weight_decay > 0 else optax.adam(sched))
    augment = (dict(freq_masks=2, freq_width=max(2, cfg.feat_in // 5),
                    time_masks=4, time_width=0.05)
               if args.spec_augment else None)
    init_opt, train_step = make_train_step(cfg, opt,
                                           streaming=args.streaming_train,
                                           augment=augment,
                                           remat=args.remat)
    step = jax.jit(train_step, donate_argnums=(0, 1))
    opt_state = init_opt(params)
    bs = 16
    import time

    # held-out loss probe: memorization shows as train loss falling while
    # this rises/flattens — visible mid-run instead of after the 30+ min
    # suite eval
    from trt_asr_tpu.train.train_step import training_forward

    ev_feats_list = [np.asarray(frontend(a)) for _, a in evals[:16]]
    ev_t = max(f.shape[0] for f in ev_feats_list)
    ev_u = max(len(ids) for ids, _ in evals[:16])
    ev_b = len(ev_feats_list)
    evf = np.zeros((ev_b, ev_t, cfg.feat_in), np.float32)
    evfl = np.zeros((ev_b,), np.int32)
    evl = np.zeros((ev_b, ev_u), np.int32)
    evll = np.zeros((ev_b,), np.int32)
    for i, ((ids, _), f) in enumerate(zip(evals[:16], ev_feats_list)):
        evf[i, : f.shape[0]] = f
        evfl[i] = f.shape[0]
        evl[i, : len(ids)] = ids
        evll[i] = len(ids)
    ev_batch = Batch(evf, evfl, evl, evll)
    eval_loss = jax.jit(functools.partial(
        lambda p, b, s: jax.numpy.mean(training_forward(p, cfg, b, streaming=s)),
        s=args.streaming_train))

    t0 = time.time()
    state_dir = os.path.join(args.out_dir, "train_state")
    start = 0
    if args.resume_train_state and \
            os.path.exists(os.path.join(state_dir, "train_manifest.json")):
        from trt_asr_tpu.train.checkpoint import load_train_state
        params, opt_state, start = load_train_state(state_dir,
                                                    init_opt(params))
        for _ in range(start):  # re-align the batch-selection rng stream
            rng.integers(0, b_all, size=bs)
        print(f"resumed train state at step {start}", flush=True)
    for i in range(start, args.steps):
        sel = rng.integers(0, b_all, size=bs)
        batch = Batch(feats[sel], feat_len[sel], labels[sel], label_len[sel])
        if augment is not None:
            params, opt_state, m = step(params, opt_state, batch,
                                        jax.random.PRNGKey(i))
        else:
            params, opt_state, m = step(params, opt_state, batch)
        if args.train_state_every and (i + 1) % args.train_state_every == 0:
            from trt_asr_tpu.train.checkpoint import save_train_state
            save_train_state(state_dir, params, opt_state, step=i + 1)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            hl = float(np.asarray(eval_loss(params, ev_batch)))
            print(f"step {i:4d}: loss {float(np.asarray(m['loss'])):8.4f} "
                  f"heldout {hl:8.4f}", flush=True)
    print(f"trained in {time.time()-t0:.0f}s")

    # ---- save model dir ----
    model = ParakeetTDT(cfg, params, tokenizer, frontend=frontend)
    model.save_model_dir(mdir)
    return _evaluate(args, words, evals, mdir)


def _evaluate(args, words, evals, mdir) -> int:
    # ---- held-out wavs + manifests (clean + additive-noise copy) ----
    import json

    from trt_asr_tpu.eval.manifest import ManifestEntry, write_manifest
    from trt_asr_tpu.io.wav import save_wav

    manifests = {}
    for tag, snr in (("clean", None), ("noisy", args.noise_snr_db)):
        if tag == "noisy" and (snr is None or snr <= 0):
            continue
        entries = []
        wav_dir = os.path.join(args.out_dir, f"wavs_{tag}")
        os.makedirs(wav_dir, exist_ok=True)
        nrng = np.random.default_rng(99)
        for i, (ids, audio) in enumerate(evals):
            a = add_noise(audio, snr, nrng) if snr else audio
            p = os.path.join(wav_dir, f"utt{i}.wav")
            save_wav(p, a)
            entries.append(ManifestEntry(p, " ".join(words[k] for k in ids)))
        man = os.path.join(args.out_dir, f"eval_{tag}.tsv")
        write_manifest(man, entries)
        manifests[tag] = man

    if args.sabotage:
        os.environ["TRT_ASR_SABOTAGE"] = args.sabotage

    # ---- the suite matrix: surface x condition x variant x granularity ----
    # Full (condition x variant x sim) matrix on the python surface; the
    # batch (lockstep slots, staggered attach/finalize) and native (C++ CLI
    # subprocess, fast-mode env) surfaces run the clean-condition gate row
    # per variant at the first granularity (VERDICT r2 #6: the gate must
    # face every serving surface, with the sensitivity proof on each).
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    sims = [float(s) for s in args.stream_sims.split(",") if s.strip()]
    surfaces = [s.strip() for s in args.surfaces.split(",") if s.strip()]
    native_env = {"TRT_ASR_QUANT": "all", "TRT_ASR_PALLAS_ATT": "1"}
    matrix = {}
    # per-surface gate row: "base" when run, else the surface's first
    # variant — a --variants list without "base" must still produce a
    # gate verdict (and the artifact), not a KeyError after hours of work
    gate_variants = {}
    for surface in surfaces:
        surf_tags = manifests if surface == "python" else {
            "clean": manifests["clean"]}
        surf_sims = sims if surface == "python" else sims[:1]
        surf_variants = variants
        old_env = {}
        if surface == "native":
            # fast mode: int8 weights + fused attention kernel
            old_env = {k: os.environ.get(k) for k in native_env}
            os.environ.update(native_env)
            surf_variants = [v.strip() for v in args.native_variants.split(",")
                             if v.strip()]
            if args.native_eval_utts < len(evals):
                from trt_asr_tpu.eval.manifest import read_manifest
                sub = read_manifest(manifests["clean"])[: args.native_eval_utts]
                man_n = os.path.join(args.out_dir, "eval_clean_native.tsv")
                write_manifest(man_n, sub)
                surf_tags = {"clean": man_n}
        gate_variants[surface] = ("base" if "base" in surf_variants
                                  else surf_variants[0])
        try:
            for tag, man in surf_tags.items():
                for sim in surf_sims:
                    res = run_suite(SuiteConfig(
                        manifest_path=man,
                        out_dir=os.path.join(
                            args.out_dir, f"suite_{surface}_{tag}_s{sim}"),
                        model_dir=mdir,
                        engine={"python": "python", "batch": "batch",
                                "native": "native"}[surface],
                        native_cli=args.native_cli,
                        batch_size=args.batch_size,
                        variants=surf_variants, rounds=1,
                        stream_sim=sim, feature_norm="none"))
                    for v in surf_variants:
                        wer = res["variants"][v][0]["wer"]
                        matrix[f"{surface}/{tag}/{v}/sim{sim}"] = wer
                        print(f"  {surface:6s} {tag:5s} {v:16s} sim={sim:.1f}: "
                              f"WER {wer['wer']*100:6.2f}% "
                              f"(S={wer['substitutions']} I={wer['insertions']} "
                              f"D={wer['deletions']} N={wer['ref_words']} "
                              f"empty={wer['empty_hypotheses']})")
        finally:
            for k, v in old_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    gates = {s: matrix[f"{s}/clean/{gate_variants[s]}/sim{sims[0]}"]
             for s in surfaces}
    # streaming-granularity invariance across sims (python surface)
    sim_wers = ([matrix[f"python/clean/{gate_variants['python']}/sim{s}"]["wer"]
                 for s in sims] if "python" in surfaces else [])
    if args.artifact:
        with open(args.artifact, "w") as f:
            json.dump({"config": vars(args), "vocab_size": len(words),
                       "matrix": matrix,
                       "gate_per_surface": {
                           s: {"wer": g["wer"],
                               "variant": gate_variants[s],
                               "pass": g["wer"] <= args.gate_wer}
                           for s, g in gates.items()}}, f, indent=1)
        print(f"wrote {args.artifact}")
    for s, g in gates.items():
        print(f"HELD-OUT WER ({s}/clean/{gate_variants[s]}): "
              f"{g['wer']*100:.2f}%")
    if sim_wers:
        print(f"granularity sweep: {[f'{w*100:.2f}%' for w in sim_wers]}")
    fails = {s: g["wer"] for s, g in gates.items() if g["wer"] > args.gate_wer}
    if fails:
        print(f"WER GATE FAIL ({fails} > {args.gate_wer})")
        return 1
    if sim_wers and max(sim_wers) - min(sim_wers) > 1e-9:
        print("WER GATE FAIL (transcript depends on push granularity)")
        return 1
    print("WER GATE PASS "
          + " ".join(f"{s}={g['wer']*100:.2f}%" for s, g in gates.items())
          + f" (<= {args.gate_wer*100:.0f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
