#!/usr/bin/env python3
"""Architecture audit (reference tools/verify_nemo/audit_model_arch.py ->
audit_model_arch.json): dump architecture config + per-component parameter
stats + contract consistency checks from a model dir.

    python tools/audit_model.py --model-dir DIR [--out audit.json]
"""
import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from trt_asr_tpu.contract import load_contract
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.models.parakeet.params import num_params

    model = ParakeetTDT.from_model_dir(args.model_dir)
    cfg = model.cfg

    def comp_stats(node):
        leaves = jax.tree.leaves(node)
        n = sum(int(np.prod(x.shape)) for x in leaves)
        return {"tensors": len(leaves), "params": n}

    checks = []

    def check(cid, desc, value, expected):
        ok = value == expected
        checks.append({"id": cid, "desc": desc, "value": value,
                       "expected": expected, "status": "pass" if ok else "FAIL"})

    contract = load_contract()
    full = cfg.d_model == contract.encoder.d_model
    if full:
        check("subsampling_factor_8", "FastConformer 8x subsampling",
              cfg.subsampling_factor, 8)
        check("conv_kernel_9", "Conformer conv kernel", cfg.conv_kernel_size, 9)
        check("subsampling_channels_256", "dw_striding channels",
              cfg.subsampling_conv_channels, 256)
        check("joint_vocab_8198", "joint head size", cfg.joint_vocab_size, 8198)
    check("duration_head", "TDT duration values",
          list(cfg.duration_values), [0, 1, 2, 3, 4])
    check("blank_is_vocab", "blank id == vocab size", cfg.blank_id, cfg.vocab_size)
    check("streaming_arithmetic", "shift == valid_out * subsampling",
          cfg.shift_size_frames[1], cfg.valid_out_len * cfg.subsampling_factor)
    check("conv_cache", "time cache == (kernel-1)//2", cfg.conv_context_size,
          (cfg.conv_kernel_size - 1) // 2)
    check("vocab_file_size", "vocab.txt entries == vocab_size",
          len(model.tokenizer), cfg.vocab_size)

    audit = {
        "model_dir": os.path.abspath(args.model_dir),
        "config": dataclasses.asdict(cfg),
        "total_params": num_params(model.params),
        "components": {
            "encoder": comp_stats(model.params["encoder"]),
            "predictor": comp_stats(model.params["predictor"]),
            "joint": comp_stats(model.params["joint"]),
        },
        "prompt_tokens": model.prompt_ids,
        "checks": checks,
    }
    text = json.dumps(audit, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"audit -> {args.out}")
    failed = [c for c in checks if c["status"] == "FAIL"]
    for c in checks:
        print(f"  [{c['status']}] {c['id']}: {c['value']} (expected {c['expected']})")
    print(f"total params: {audit['total_params']:,}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
