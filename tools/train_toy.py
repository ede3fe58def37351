#!/usr/bin/env python3
"""End-to-end training demonstration: overfit a tiny model on synthetic
utterances, checkpoint, reload, decode. Validates the full training path
(TDT loss -> grads -> optax -> checkpoint round-trip -> greedy decode) —
a capability the reference (inference-only) does not have.

    python tools/train_toy.py --steps 200 --out /tmp/toy_ckpt [--mesh]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", "env"])
    ap.add_argument("--mesh", action="store_true",
                    help="shard the step over all devices (dp x tp)")
    args = ap.parse_args()

    if args.platform != "env":
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform != "env":
        jax.config.update("jax_platforms", args.platform)
    import optax

    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state, tdt_greedy_decode_chunk
    from trt_asr_tpu.models.parakeet import init_params, offline_encode
    from trt_asr_tpu.models.parakeet.params import load_checkpoint, save_checkpoint
    from trt_asr_tpu.train import make_train_step
    from trt_asr_tpu.train.train_step import Batch

    cfg = ModelConfig.tiny(num_layers=2, d_model=64, n_heads=4,
                           subsampling_conv_channels=16, vocab_size=32,
                           pred_hidden=32, joint_hidden=32, feat_in=16)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    b, t, u = 4, 57, 4
    batch = Batch(
        feats=rng.standard_normal((b, t, cfg.feat_in)).astype(np.float32),
        feat_len=np.full((b,), t, np.int32),
        labels=rng.integers(0, cfg.vocab_size, size=(b, u)).astype(np.int32),
        label_len=np.full((b,), u, np.int32),
    )

    init_opt, train_step = make_train_step(cfg, optax.adam(args.lr))
    if args.mesh:
        from trt_asr_tpu.parallel import make_mesh, shard_batch, shard_params

        n = len(jax.devices())
        tp = 2 if n % 2 == 0 and n > 1 else 1
        mesh = make_mesh(dp=n // tp, tp=tp)
        print(f"mesh: dp={n // tp} tp={tp}")
        with mesh:
            params = shard_params(params, mesh)
            batch = shard_batch(batch, mesh)
    step = jax.jit(train_step, donate_argnums=(0, 1))
    opt_state = init_opt(params)

    t0 = time.time()
    for i in range(args.steps):
        params, opt_state, m = step(params, opt_state, batch)
        if i % max(args.steps // 10, 1) == 0 or i == args.steps - 1:
            print(f"step {i:4d}: loss {float(np.asarray(m['loss'])):8.4f} "
                  f"gnorm {float(np.asarray(m['grad_norm'])):7.3f}")
    print(f"trained {args.steps} steps in {time.time()-t0:.1f}s")

    if args.out:
        save_checkpoint(args.out, jax.device_get(params), {"toy": True})
        params = load_checkpoint(args.out)
        print(f"checkpoint round-trip: {args.out}")

    enc, enc_len = offline_encode(params, cfg, batch.feats, batch.feat_len)
    correct = 0
    for i in range(b):
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        toks, n, _ = tdt_greedy_decode_chunk(
            params, cfg, np.asarray(enc)[i], np.int32(int(np.asarray(enc_len)[i])),
            ds, max_tokens=32)
        got = [int(x) for x in np.asarray(toks)[: int(n)]]
        want = list(batch.labels[i])
        mark = "OK " if got == want else "   "
        correct += got == want
        print(f"{mark}utt {i}: want {want} got {got}")
    print(f"recovered {correct}/{b} training utterances")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
