#!/usr/bin/env python3
"""ONNX component export CLI (reference tools/export_onnx/export.py
equivalent): model-dir weights -> {encoder,predictor,joint}.onnx +
model_meta.json (torch layouts, NeMo state-dict initializer names).

    python tools/export_onnx/export.py --model-dir DIR --outdir OUT \
        [--component encoder|predictor|joint|all] [--external-threshold BYTES]
"""
import argparse
import os
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

from trt_asr_tpu.io.onnx_weights import export_params_to_onnx  # noqa: E402
from trt_asr_tpu.models.parakeet.model import ParakeetTDT  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--component", default="all",
                    choices=["all", "encoder", "predictor", "joint"])
    ap.add_argument("--external-threshold", type=int, default=1 << 20)
    args = ap.parse_args()

    model = ParakeetTDT.from_model_dir(args.model_dir)
    # tokenizer asset alongside the graphs (reference export.py:854-904
    # writes vocab.txt next to the components; import_onnx_model.py and the
    # numpy pipeline read it from the export dir)
    from trt_asr_tpu.tokenizer import write_vocab

    os.makedirs(args.outdir, exist_ok=True)
    write_vocab(os.path.join(args.outdir, "vocab.txt"), model.tokenizer.vocab)
    paths = export_params_to_onnx(model.params, model.cfg, args.outdir,
                                  external_threshold=args.external_threshold,
                                  prompt_ids=model.prompt_ids)
    for comp, p in paths.items():
        if args.component not in ("all", comp):
            os.remove(p)
            if os.path.exists(p + ".data"):
                os.remove(p + ".data")
            continue
        size = os.path.getsize(p)
        ext = p + ".data"
        ext_size = os.path.getsize(ext) if os.path.exists(ext) else 0
        print(f"{comp}: {p} ({size} B + {ext_size} B external)")
    # load-back smoke test (the reference ran an ORT smoke after export)
    from trt_asr_tpu.io.onnx_weights import load_params_from_onnx

    if args.component == "all":
        load_params_from_onnx(model.cfg, args.outdir)
        print("load-back smoke: OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
