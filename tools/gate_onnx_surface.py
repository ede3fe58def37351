#!/usr/bin/env python3
"""WER gate, 4th surface: the pure-numpy ONNX pipeline.

Replays the r3 gate's held-out eval set (deterministic: make_words(vocab) +
make_set(n, seed=2), tools/train_synthetic_e2e.py) through
tools/onnx_pipeline.py — the exported graphs executed by the numpy
interpreter, no JAX/torch in the compute path — against the committed
trained gate model (artifacts/models/gate_r3). The reference's gate ran
every serving surface through the same manifest (tools/stt_suite/
run_suite.py:117-125); r3 covered python/batch/native, this adds the
export-consumer surface.

Per-surface sensitivity proof (the gate must be able to FAIL): a second
pass reproduces the reference's while-loop-reset bug (duration overshoot
dropped at chunk boundaries — the runtime's TRT_ASR_SABOTAGE=
drop_time_carry) inside the pipeline's decode loop and must push WER above
the gate bar.

    python tools/gate_onnx_surface.py [--model-dir artifacts/models/gate_r3]
        [--eval-utts 50] [--gate-wer 0.05] [--out artifacts/...json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)

from tools.onnx_pipeline import OnnxStreamingPipeline  # noqa: E402
from tools.train_synthetic_e2e import make_set, make_words  # noqa: E402


class _DropTimeCarryPipeline(OnnxStreamingPipeline):
    """Fault injection: the reference's while-loop-reset bug (duration
    overshoot dropped at every chunk boundary; cpp/src/parakeet_trt.cpp:2914
    class of bug, runtime sabotage 'drop_time_carry')."""

    def _decode(self, enc):
        super()._decode(enc)
        self._time_carry = 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir",
                    default=os.path.join(REPO, "artifacts/models/gate_r3"))
    ap.add_argument("--eval-utts", type=int, default=50)
    ap.add_argument("--words-per-utt", default="8,13")
    ap.add_argument("--gate-wer", type=float, default=0.05)
    ap.add_argument("--out",
                    default=os.path.join(
                        REPO, "artifacts/e2e_wer_gate_onnx_pipeline.json"))
    args = ap.parse_args()

    # features come from the JAX frontend (the pipeline consumes mel
    # features; its independence claim is about the MODEL compute path) —
    # force CPU before any device touch
    import jax

    jax.config.update("jax_platforms", "cpu")

    from trt_asr_tpu.eval.wer import score_corpus
    from trt_asr_tpu.frontend import StreamingLogMel
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT

    model = ParakeetTDT.from_model_dir(args.model_dir)
    words = make_words(model.cfg.vocab_size)

    # the r3 gate's held-out set — the SAME make_set the other surfaces use
    w_lo, w_hi = (int(x) for x in args.words_per_utt.split(","))
    evals = make_set(args.eval_utts, 2, words, w_lo, w_hi)

    export_dir = tempfile.mkdtemp(prefix="gate_onnx_")
    from trt_asr_tpu.io.onnx_weights import export_params_to_onnx

    export_params_to_onnx(jax.tree.map(np.asarray, model.params), model.cfg,
                          export_dir, encoder_t_in=57,
                          prompt_ids=model.prompt_ids)

    # features computed ONCE for both passes (the surface under test is the
    # exported-graph model compute path, not the frontend)
    feat_sets = [np.asarray(StreamingLogMel(model.frontend).push(audio))
                 for _, audio in evals]

    def run(pipeline_cls):
        refs, hyps = [], []
        pipe = pipeline_cls(export_dir)   # one graph parse; reset per utt
        t0 = time.perf_counter()
        for (ids, _), feats in zip(evals, feat_sets):
            pipe.reset()
            pipe.push_features(feats)
            pipe.finalize()
            refs.append(" ".join(words[k] for k in ids))
            hyps.append(model.tokenizer.decode(pipe.tokens))
        d = score_corpus(zip(refs, hyps))
        d.pop("per_utterance")
        d["secs"] = round(time.perf_counter() - t0, 1)
        return d

    clean = run(OnnxStreamingPipeline)
    sab = run(_DropTimeCarryPipeline)

    ok = clean["wer"] <= args.gate_wer and sab["wer"] > args.gate_wer
    result = {
        "surface": "onnx_pipeline (pure-numpy exported-graph executor)",
        "model_dir": os.path.relpath(args.model_dir, REPO),
        "eval_utts": args.eval_utts,
        "gate_wer": args.gate_wer,
        "clean": clean,
        "sabotage_drop_time_carry": sab,
        "pass": bool(ok),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("surface", "pass")}))
    print(f"clean WER {clean['wer']:.4f} ({clean['secs']}s), sabotage WER "
          f"{sab['wer']:.4f} — gate bar {args.gate_wer}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
