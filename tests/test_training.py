"""Training capability: the TDT loss + train step must actually LEARN —
overfit a tiny model on a fixed batch and recover the target labels with
greedy decode. (Beyond-reference: the reference is inference-only.)"""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import init_params, offline_encode
from trt_asr_tpu.train import make_train_step, training_forward
from trt_asr_tpu.train.train_step import Batch


@pytest.fixture(scope="module")
def tiny_train():
    cfg = ModelConfig.tiny(num_layers=1, d_model=32, n_heads=4,
                           subsampling_conv_channels=8, vocab_size=16,
                           pred_hidden=16, joint_hidden=16, feat_in=16)
    params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    b, t, u = 2, 57, 3
    batch = Batch(
        feats=rng.standard_normal((b, t, cfg.feat_in)).astype(np.float32),
        feat_len=np.full((b,), t, np.int32),
        labels=np.array([[3, 7, 11], [5, 2, 9]], np.int32),
        label_len=np.full((b,), u, np.int32),
    )
    return cfg, params, batch


def test_training_reduces_loss_and_overfits(tiny_train):
    import jax
    import optax

    cfg, params, batch = tiny_train
    init_opt, train_step = make_train_step(cfg, optax.adam(3e-3))
    train_step = jax.jit(train_step)
    opt_state = init_opt(params)

    loss0 = float(np.asarray(training_forward(params, cfg, batch)).mean())
    losses = []
    for _ in range(150):
        params, opt_state, metrics = train_step(params, opt_state, batch)
        losses.append(float(np.asarray(metrics["loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * loss0, f"loss {loss0:.3f} -> {losses[-1]:.3f}"

    # greedy decode recovers the overfit targets
    from trt_asr_tpu.decode import init_decode_state, prime_decode_state, tdt_greedy_decode_chunk

    enc, enc_len = offline_encode(params, cfg, batch.feats, batch.feat_len)
    hits = 0
    for i in range(2):
        ds = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        toks, n, _ = tdt_greedy_decode_chunk(
            params, cfg, np.asarray(enc)[i], np.int32(int(np.asarray(enc_len)[i])),
            ds, max_tokens=32)
        got = [int(x) for x in np.asarray(toks)[: int(n)]]
        if got == list(batch.labels[i]):
            hits += 1
    assert hits >= 1, "overfit model failed to decode its training targets"


def test_loss_prefers_correct_labels(tiny_train):
    """Sanity: after training, the NLL of the true labels is much lower
    than of random labels."""
    cfg, params, batch = tiny_train
    import jax
    import optax

    init_opt, train_step = make_train_step(cfg, optax.adam(3e-3))
    train_step = jax.jit(train_step)
    opt_state = init_opt(params)
    for _ in range(100):
        params, opt_state, _ = train_step(params, opt_state, batch)

    nll_true = float(np.asarray(training_forward(params, cfg, batch)).mean())
    wrong = Batch(batch.feats, batch.feat_len,
                  labels=np.array([[1, 14, 6], [12, 0, 4]], np.int32),
                  label_len=batch.label_len)
    nll_wrong = float(np.asarray(training_forward(params, cfg, wrong)).mean())
    assert nll_true + 1.0 < nll_wrong