#!/usr/bin/env python3
"""Train a token n-gram LM for shallow fusion from a text corpus.

Tokenizes each line with the model's own vocab (greedy longest-match,
the training pipeline's labels) and fits a stupid-backoff n-gram LM
(trt_asr_tpu/decode/ngram_lm.py):

    python tools/ngram_lm_fit.py corpus.txt --model-dir m --out lm.json \
        [--order 3] [--alpha 0.4]

Use it: python -m trt_asr_tpu.cli a.wav --model-dir m --beam 4 \
            --lm lm.json --lm-weight 0.3
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus", help="text file, one sentence per line")
    ap.add_argument("--model-dir", help="model dir providing vocab.txt")
    ap.add_argument("--vocab", default="", help="or a bare vocab.txt")
    ap.add_argument("--out", required=True)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--alpha", type=float, default=0.4)
    args = ap.parse_args()

    import os

    from trt_asr_tpu.decode.ngram_lm import fit_from_text
    from trt_asr_tpu.tokenizer import Tokenizer

    if args.vocab:
        vocab_path = args.vocab
    elif args.model_dir:
        vocab_path = os.path.join(args.model_dir, "vocab.txt")
    else:
        ap.error("provide --model-dir or --vocab")
    tok = Tokenizer.from_file(vocab_path)
    with open(args.corpus) as f:
        lines = f.readlines()
    lm = fit_from_text(lines, tok, order=args.order, alpha=args.alpha)
    lm.save(args.out)
    n_ctx = len(lm.counts)
    print(f"fit order-{args.order} LM over {len(lines)} lines "
          f"({n_ctx} contexts, vocab {lm.vocab_size}) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
