#!/usr/bin/env python3
"""Predictor + joint single-step micro-parity (reference
tools/onnxruntime/onnx_predictor_joint_parity.py): JAX components vs the
torch oracle at contract tolerances, plus a step-0 input-swap localization
test (reference compare_joint_step0.py — the 2x2 swap that binary-searches
a divergence to one component).

    python tools/parity/component_parity.py [--config tiny --seed 1 | --model-dir DIR]
"""
import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="")
    ap.add_argument("--config", default="tiny", choices=["tiny", "full"])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--summary", default="")
    args = ap.parse_args()

    import os
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from oracle.torch_parakeet import TorchParakeet
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.contract import load_contract
    from trt_asr_tpu.models.parakeet.joint import joint_apply
    from trt_asr_tpu.models.parakeet.params import init_params
    from trt_asr_tpu.models.parakeet.predictor import predictor_sequence

    if args.model_dir:
        from trt_asr_tpu.models.parakeet.model import ParakeetTDT

        m = ParakeetTDT.from_model_dir(args.model_dir)
        cfg, params = m.cfg, m.params
    else:
        cfg = ModelConfig.tiny() if args.config == "tiny" else ModelConfig()
        params = init_params(cfg, seed=args.seed)
    oracle = TorchParakeet(cfg, params)
    tol = load_contract().tolerances

    rng = np.random.default_rng(0)
    results = {}

    # predictor single-step + sequence
    y = rng.integers(0, cfg.vocab_size, size=(1, 4)).astype(np.int32)
    h0 = np.zeros((cfg.pred_rnn_layers, 1, cfg.pred_hidden), np.float32)
    g_j, h_j, c_j = predictor_sequence(params["predictor"], y, h0, h0)
    g_t, h_t, c_t = oracle.predictor(y, h0, h0)
    results["predictor_g_max_abs"] = float(np.abs(np.asarray(g_j) - g_t).max())
    results["predictor_h_max_abs"] = float(np.abs(np.asarray(h_j) - h_t).max())
    results["predictor_c_max_abs"] = float(np.abs(np.asarray(c_j) - c_t).max())

    # joint logits
    enc = rng.standard_normal((1, 3, cfg.d_model)).astype(np.float32)
    lo_j = np.asarray(joint_apply(params["joint"], enc, np.asarray(g_j)))
    lo_t = oracle.joint(enc, g_t)
    results["joint_logits_max_abs"] = float(np.abs(lo_j - lo_t).max())

    # step-0 input-swap 2x2 (localizes encoder-vs-predictor divergence)
    enc_j = enc  # stand-in: in a cross-backend run these come from each side
    swaps = {}
    for enc_src, pred_src, name in ((enc_j, np.asarray(g_j), "jax_jax"),
                                    (enc_j, g_t, "jax_torch"),
                                    (enc, np.asarray(g_j), "torch_jax"),
                                    (enc, g_t, "torch_torch")):
        out = np.asarray(joint_apply(params["joint"], enc_src, np.asarray(pred_src)))
        swaps[name] = float(np.abs(out - lo_t).max())
    results["step0_swap"] = swaps

    ok = (results["predictor_g_max_abs"] <= tol.cpu_f32_atol
          and results["joint_logits_max_abs"] <= 1e-3)
    results["pass"] = bool(ok)
    print(json.dumps(results, indent=1))
    if args.summary:
        with open(args.summary, "w") as f:
            json.dump(results, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
