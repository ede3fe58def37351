"""Trained-model decision margins vs int8 perturbation (VERDICT r2 weak #4).

Companion to tools/parity/int8_decode_agreement.py: that tool measures the
int8 logit perturbation (delta) at FULL SIZE, where only random-init
weights exist in this environment and decision margins are ~0 (untrained
posteriors are near-uniform, so closed-loop agreement fails there by
construction). This tool supplies the other half of the safety condition
on a TRAINED model — the WER gate's model — by measuring:

- the decision-margin distribution (top1 - top2 token logit) along the
  REAL greedy decode path over held-out audio, split into emission
  decisions and blank decisions (host decode trace_topk machinery,
  reference tdt_trace.py:294-356 role), and
- the same model's int8 delta on shared inputs (joint-only and
  end-to-end through the int8 encoder, the int8_decode_agreement recipe).

Safety condition: margins >> 2*delta at the decisions that matter.
A trained model separates its argmax by orders of magnitude more than
int8 weight rounding perturbs it — the quantitative, measured form of
the r2 "int8 is decode-quality-safe" claim (previously extrapolated from
WER alone).

Usage (after tools/run_gate_r3.sh trains the gate model):
    python tools/parity/trained_margins.py --model-dir /tmp/gate_r3/model \
        --wav-dir /tmp/gate_r3/wavs_clean --n 20 \
        --out artifacts/parity/trained_margins_vs_int8_delta.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--wav-dir", required=True)
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--out",
                    default="artifacts/parity/trained_margins_vs_int8_delta.json")
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from trt_asr_tpu.decode import tdt_greedy_decode_host
    from trt_asr_tpu.io.wav import load_wav
    from trt_asr_tpu.models.parakeet import offline_encode
    from trt_asr_tpu.models.parakeet.joint import joint_apply, joint_single_step
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.models.parakeet.predictor import predictor_step
    from trt_asr_tpu.models.parakeet.quant import quantize_params

    m = ParakeetTDT.from_model_dir(args.model_dir)
    cfg, params = m.cfg, m.params
    q_all = quantize_params(params, "all")

    wavs = sorted(glob.glob(os.path.join(args.wav_dir, "*.wav")))[: args.n]
    if not wavs:
        print(f"no wavs under {args.wav_dir}")
        return 2

    em_margins, bl_margins = [], []
    d_joint_all, d_e2e_all, flips_all = [], [], []
    n_toks = 0
    for w in wavs:
        audio = load_wav(w)
        feats = m.features(audio, norm="none")[None]
        lens = np.array([feats.shape[1]], np.int32)
        enc, enc_len = offline_encode(params, cfg, feats, lens)
        t = int(np.asarray(enc_len)[0])
        enc_np = np.asarray(enc, np.float32)[0, :t]

        h = np.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden), np.float32)
        g, h, c = predictor_step(params["predictor"],
                                 np.array([cfg.blank_id], np.int32), h, h)

        def joint_fn(enc_t, gg):
            return np.asarray(joint_single_step(
                params["joint"], enc_t[None], gg[None]))[0]

        def pred_fn(tok, st):
            hh, cc = st
            gg, h2, c2 = predictor_step(
                params["predictor"], np.array([tok], np.int32), hh, cc)
            return np.asarray(gg)[0], (h2, c2)

        trace = []
        toks, _, _, _ = tdt_greedy_decode_host(
            enc_np, joint_fn, pred_fn, (h, c), np.asarray(g)[0],
            cfg.blank_id, blank_id=cfg.blank_id,
            token_head_size=cfg.token_head_size,
            duration_values=cfg.duration_values,
            max_symbols=cfg.max_symbols_per_timestep,
            trace=trace, trace_topk=2)
        n_toks += len(toks)
        for rec in trace:
            mg = rec["topk"][0][1] - rec["topk"][1][1]
            (bl_margins if rec["is_blank"] else em_margins).append(mg)

        # int8 delta on shared inputs (same recipe as the full-size tool)
        g0 = np.asarray(g, np.float32)                       # [1, P]
        logits_ref = np.asarray(joint_apply(
            params["joint"], jnp.asarray(enc_np[None]), jnp.asarray(g0[:, None])),
            np.float32)[0, :, 0]
        logits_qj = np.asarray(joint_apply(
            q_all["joint"], jnp.asarray(enc_np[None]), jnp.asarray(g0[:, None])),
            np.float32)[0, :, 0]
        enc_q8, _ = offline_encode(q_all, cfg, feats, lens,
                                   compute_dtype=jnp.bfloat16)
        enc_q8_np = np.asarray(enc_q8, np.float32)[0, :t]
        logits_qe = np.asarray(joint_apply(
            q_all["joint"], jnp.asarray(enc_q8_np[None]), jnp.asarray(g0[:, None])),
            np.float32)[0, :, 0]
        d_joint_all.append(np.abs(logits_qj - logits_ref).max(axis=-1))
        d_e2e_all.append(np.abs(logits_qe - logits_ref).max(axis=-1))
        # the max-over-vocab delta above is an UPPER BOUND on what a
        # decision feels; the decision-level measurement is whether the two
        # argmaxes TDT actually takes (token head, duration head) flip
        v_tok = cfg.token_head_size
        for sl in (slice(0, v_tok), slice(v_tok, None)):
            flips_all.append(logits_qe[:, sl].argmax(-1)
                             != logits_ref[:, sl].argmax(-1))

    em = np.asarray(em_margins)
    bl = np.asarray(bl_margins)
    dj = np.concatenate(d_joint_all)
    de = np.concatenate(d_e2e_all)

    def stats(x):
        return {"n": int(x.size), "min": float(x.min()),
                "p5": float(np.percentile(x, 5)),
                "p50": float(np.percentile(x, 50))} if x.size else {"n": 0}

    summary = {
        "model_dir": args.model_dir,
        "utterances": len(wavs),
        "emitted_tokens": n_toks,
        "emission_margins_logits": stats(em),
        "blank_margins_logits": stats(bl),
        "int8_delta_joint_only": {"p95": float(np.percentile(dj, 95)),
                                  "max": float(dj.max())},
        "int8_delta_e2e": {"p95": float(np.percentile(de, 95)),
                           "max": float(de.max())},
        "safety_ratio_emission_p5_over_delta_e2e_p95":
            float(np.percentile(em, 5) / np.percentile(de, 95)) if em.size else None,
        # the decision-level number: fraction of (position, head) argmax
        # decisions the int8 e2e path flips on the blank-primed predictor
        # state — the max-over-vocab delta is an upper bound; THIS is what
        # decode outcomes respond to (see PERFNOTES r3 int8 section)
        "decision_flip_rate_e2e": float(np.concatenate(flips_all).mean()),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
