#!/usr/bin/env python3
"""One-command import: a reference-layout ONNX export directory -> a
runnable model directory.

This is the drop-in path for real Parakeet-TDT-0.6B-v3 weights
(docs/REAL_WEIGHTS.md): the reference's export tooling
(/root/reference/tools/export_onnx/export.py) produces
{encoder[_streaming],predictor,joint}.onnx + model_meta.json + vocab.txt;
this tool loads the initializers through the strict name-mapped loader
(io/onnx_weights.py — torch layouts transposed to MXU layouts at load),
cross-checks model_meta against the contract-derived config, and writes a
model dir (config.json + params.npz + per-tensor sha256 manifest +
vocab.txt) every runtime surface accepts via --model-dir.

    python tools/import_onnx_model.py <export_dir> --out my_model \
        [--nemo-compat-chunk0] [--name-map map.json] [--verify]

--verify pushes one deterministic utterance through a StreamingSession of
the imported model and prints the transcript + chunk count (a live smoke,
not a parity claim — parity harnesses take goldens, tools/parity/).
"""
import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("onnx_dir", help="reference-layout ONNX export directory")
    ap.add_argument("--out", required=True, help="model directory to write")
    ap.add_argument("--contract", default="",
                    help="contract JSON deriving the architecture "
                         "(default: the in-tree parakeet-tdt-0.6b-v3)")
    ap.add_argument("--vocab", default="",
                    help="vocab.txt path when the export dir lacks one")
    ap.add_argument("--name-map", default="",
                    help="optional {pytree_path: onnx_name} override JSON "
                         "for foreign naming schemes")
    ap.add_argument("--nemo-compat-chunk0", action="store_true",
                    help="bit-faithful real-export chunk-0 semantics "
                         "(drop_extra applied on chunk 0 — required when "
                         "validating against goldens from the real export)")
    ap.add_argument("--verify", action="store_true",
                    help="decode one deterministic utterance through a "
                         "streaming session of the imported model")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    from trt_asr_tpu.runtime.platform import ensure_requested_platform

    ensure_requested_platform()

    import dataclasses

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.contract import load_contract
    from trt_asr_tpu.io.onnx_weights import load_params_from_onnx, read_model_meta
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.tokenizer import Tokenizer

    meta = read_model_meta(args.onnx_dir)   # validates cross-field arithmetic
    if meta.get("config"):
        # self-describing export (legacy v1 or reference meta with a config
        # block): architecture comes from the artifact itself; the block may
        # carry derived fields (conv_context_size, ...) — keep init args only
        fields = {f.name for f in dataclasses.fields(ModelConfig) if f.init}
        raw = {k: tuple(v) if isinstance(v, list) else v
               for k, v in meta["config"].items() if k in fields}
        cfg = ModelConfig(**raw)
        src = "model_meta config block"
    else:
        contract = load_contract(args.contract or None)
        cfg = ModelConfig.from_contract(contract)
        src = args.contract or "contracts/parakeet-tdt-0.6b-v3.json"
    if args.nemo_compat_chunk0:
        cfg = dataclasses.replace(cfg, nemo_compat_chunk0=True)

    for field, want, got in (("vocab_size", cfg.vocab_size, meta["vocab_size"]),
                             ("n_mels", cfg.feat_in, meta["n_mels"])):
        if got is not None and got != want:
            raise SystemExit(f"model_meta {field}={got} contradicts the "
                             f"config's {want} ({src}) — wrong contract or "
                             f"wrong export")

    params = load_params_from_onnx(cfg, args.onnx_dir,
                                   name_map_override=args.name_map or None)
    n_tensors = sum(1 for _ in _leaves(params))
    n_params = sum(x.size for x in _leaves(params))
    vocab_path = args.vocab or os.path.join(args.onnx_dir, "vocab.txt")
    if not os.path.exists(vocab_path):
        raise SystemExit(f"no vocab.txt in {args.onnx_dir} — pass --vocab "
                         f"(the reference export writes it next to the "
                         f"components, export.py:854-904)")
    tok = Tokenizer.from_file(vocab_path, blank_id=cfg.blank_id)
    model = ParakeetTDT(cfg, params, tok)
    model.save_model_dir(args.out)
    with open(os.path.join(args.out, "manifest.json")) as f:
        n_hashes = len(json.load(f)["tensors"])
    print(f"imported {n_tensors} tensors ({n_params/1e6:.1f}M params, "
          f"architecture from {src}) -> {args.out} "
          f"({n_hashes} sha256-manifested tensors)")

    if args.verify:
        import numpy as np

        from trt_asr_tpu.streaming.session import StreamingSession

        sess = StreamingSession(model)
        t = np.arange(16000 * 2, dtype=np.float32)
        audio = (0.2 * np.sin(0.04 * t) * (0.5 + 0.5 * np.sin(0.001 * t))
                 ).astype(np.float32)
        sess.push_audio(audio)
        sess.finalize()
        print(f"verify: {len(sess.chunk_latencies_ms)} chunks decoded; "
              f"transcript: {sess.text[:120]!r}")
    return 0


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    raise SystemExit(main())
