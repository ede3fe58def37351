"""SpecAugment + optimizer factory (train/augment.py, make_optimizer):
mask geometry (bands, padding untouched, adaptive widths), key
determinism, integration with the train step (augmented loss differs,
gradients flow, greedy serving path untouched), and warmup schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.train import make_optimizer, make_train_step, spec_augment
from trt_asr_tpu.train.train_step import Batch


def _batch(cfg, b=3, t=90, u=5, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        feats=rng.standard_normal((b, t, cfg.feat_in)).astype(np.float32),
        feat_len=np.array([t, t - 30, t - 60], np.int32)[:b],
        labels=rng.integers(0, cfg.vocab_size, size=(b, u)).astype(np.int32),
        label_len=np.full((b,), u, np.int32),
    )


def test_mask_geometry_and_padding():
    cfg = ModelConfig.tiny()
    batch = _batch(cfg)
    feats = jnp.asarray(batch.feats)
    key = jax.random.PRNGKey(0)
    out = np.asarray(spec_augment(key, feats, jnp.asarray(batch.feat_len),
                                  freq_masks=2, freq_width=8,
                                  time_masks=4, time_width=0.2))
    assert out.shape == batch.feats.shape
    # something was actually masked
    changed = (out != batch.feats)
    assert changed.any()
    # every changed cell is exactly zero (mask_value)
    assert np.all(out[changed] == 0.0)
    # padding frames (beyond feat_len) are never touched by time masks
    # (freq masks disabled to isolate the time-axis invariant)
    out_t = np.asarray(spec_augment(key, feats, jnp.asarray(batch.feat_len),
                                    freq_masks=0, freq_width=1,
                                    time_masks=4, time_width=0.2))
    for b in range(len(batch.feat_len)):
        tl = batch.feat_len[b]
        np.testing.assert_array_equal(out_t[b, tl:], batch.feats[b, tl:])


def test_key_determinism():
    cfg = ModelConfig.tiny()
    batch = _batch(cfg)
    f = jnp.asarray(batch.feats)
    fl = jnp.asarray(batch.feat_len)
    a = np.asarray(spec_augment(jax.random.PRNGKey(7), f, fl))
    b = np.asarray(spec_augment(jax.random.PRNGKey(7), f, fl))
    c = np.asarray(spec_augment(jax.random.PRNGKey(8), f, fl))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_adaptive_time_width_bounds():
    """time_width=0.1 caps each band at 10% of the row's OWN length: the
    total masked-frame count per row is bounded by masks * width."""
    cfg = ModelConfig.tiny()
    b, t = 2, 200
    feats = jnp.ones((b, t, cfg.feat_in))
    feat_len = jnp.asarray(np.array([200, 40], np.int32))
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, feat_len,
                                  freq_masks=0, freq_width=1,
                                  time_masks=3, time_width=0.1))
    masked_rows = np.all(out == 0.0, axis=2)  # [B, T] fully-zero frames
    assert masked_rows[0].sum() <= 3 * 20
    assert masked_rows[1].sum() <= 3 * 4
    # masks stay inside the valid region
    assert not masked_rows[1, 40:].any()


def test_train_step_with_augment_and_schedule():
    cfg = ModelConfig.tiny()
    batch = _batch(cfg)
    from trt_asr_tpu.models.parakeet import init_params

    params = init_params(cfg, seed=1)
    tx, sched = make_optimizer(1e-3, schedule="noam", warmup_steps=10)
    init_opt, step = make_train_step(
        cfg, optimizer=tx,
        augment=dict(freq_masks=2, freq_width=8, time_masks=2,
                     time_width=0.1))
    opt = init_opt(params)
    step = jax.jit(step)
    p1, opt, m1 = step(params, opt, batch, jax.random.PRNGKey(0))
    p2, opt, m2 = step(p1, opt, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m1["grad_norm"]) > 0
    # augmentation reaches the loss: different keys, same params/batch
    _, _, ma = step(params, init_opt(params), batch, jax.random.PRNGKey(2))
    _, _, mb = step(params, init_opt(params), batch, jax.random.PRNGKey(3))
    assert float(ma["loss"]) != float(mb["loss"])


def test_schedules():
    _, noam = make_optimizer(1e-3, schedule="noam", warmup_steps=100)
    lrs = [float(noam(s)) for s in [1, 50, 100, 1000, 10000]]
    assert lrs[0] < lrs[1] < lrs[2]              # warmup rises
    assert lrs[2] == pytest.approx(1e-3, rel=1e-5)   # peak at warmup end
    assert lrs[2] > lrs[3] > lrs[4]              # inverse-sqrt decay
    _, cos = make_optimizer(1e-3, schedule="cosine_warmup", warmup_steps=10,
                            total_steps=100, min_lr_ratio=0.1)
    assert float(cos(0)) == 0.0
    assert float(cos(10)) == pytest.approx(1e-3, rel=1e-5)
    assert float(cos(100)) == pytest.approx(1e-4, rel=1e-3)
    with pytest.raises(ValueError):
        make_optimizer(1e-3, schedule="nope")


def test_gradient_accumulation_matches_full_batch():
    """Two half-batches under accumulation == one full batch. Verified
    with SGD, where the update is linear in the averaged gradient (Adam's
    step-1 update is g/|g| — a sign function — so float re-association
    between the B=4 and B=2 forwards flips near-zero coordinates and no
    tight bound exists). make_optimizer's accum wrapper is then checked
    for the freeze-until-kth-microbatch behavior."""
    import jax
    import optax

    from trt_asr_tpu.models.parakeet import init_params

    cfg = ModelConfig.tiny()
    rng = np.random.default_rng(0)
    b, t, u = 4, 90, 5
    full = Batch(
        feats=rng.standard_normal((b, t, cfg.feat_in)).astype(np.float32),
        feat_len=np.full((b,), t, np.int32),
        labels=rng.integers(0, cfg.vocab_size, size=(b, u)).astype(np.int32),
        label_len=np.full((b,), u, np.int32),
    )
    halves = [jax.tree.map(lambda x: x[i * 2:(i + 1) * 2], full)
              for i in range(2)]
    params = init_params(cfg, seed=1)

    init_f, step_f = make_train_step(cfg, optimizer=optax.sgd(1e-2))
    p_full, _, _ = jax.jit(step_f)(params, init_f(params), full)

    tx_a = optax.MultiSteps(optax.sgd(1e-2), every_k_schedule=2)
    init_a, step_a = make_train_step(cfg, optimizer=tx_a)
    opt = init_a(params)
    p_acc = params
    for h in halves:
        p_acc, opt, _ = jax.jit(step_a)(p_acc, opt, h)

    for x, y in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-7)

    # make_optimizer(accum_steps=2): params frozen after microbatch 1,
    # updated after microbatch 2
    tx_m, _ = make_optimizer(1e-3, schedule="constant", accum_steps=2)
    init_m, step_m = make_train_step(cfg, optimizer=tx_m)
    opt = init_m(params)
    p1, opt, _ = jax.jit(step_m)(params, opt, halves[0])
    same = all(np.array_equal(np.asarray(a), np.asarray(bb))
               for a, bb in zip(jax.tree.leaves(params), jax.tree.leaves(p1)))
    assert same, "params must not move before the accumulation boundary"
    p2, opt, _ = jax.jit(step_m)(p1, opt, halves[1])
    moved = any(not np.array_equal(np.asarray(a), np.asarray(bb))
                for a, bb in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)))
    assert moved, "params must update at the accumulation boundary"
