"""Sharded inference/training on the virtual 8-device mesh (VERDICT r1 #2).

The reference has no distributed execution (SURVEY §2.5); this is the
TPU-native scaling layer: batch (dp) and tensor (tp) sharding via GSPMD.
These tests prove the previously dryrun-only shardings give token-exact
inference and matching training numerics vs the unsharded single-device
program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode import init_decode_state, prime_decode_state
from trt_asr_tpu.models.parakeet import init_encoder_state
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.parallel import make_mesh, shard_batch, shard_params
from trt_asr_tpu.parallel.mesh import (
    batch_sharding,
    decode_state_shardings,
    encoder_state_shardings,
)
from trt_asr_tpu.streaming.batch_engine import _batch_step

B = 8


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=7)


def _inputs(cfg, seed=0):
    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((B, frames, cfg.feat_in)).astype(np.float32)
    valid = np.full((B,), frames, np.int32)
    return feats, valid, frames


def _fresh_states(model):
    cfg = model.cfg
    enc = init_encoder_state(cfg, B)
    dec = prime_decode_state(model.params, cfg,
                             init_decode_state(cfg, B), model.prompt_ids)
    return enc, dec


def _run(model, params, feats, valid, enc, dec, n_chunks=3, seed=0):
    """Run a few closed-loop batched chunks; return tokens/counts + states."""
    cfg = model.cfg
    frames = feats.shape[1]
    max_tokens = cfg.max_symbols_per_timestep * (frames // cfg.subsampling_factor + 1)
    rng = np.random.default_rng(seed + 100)
    outs = []
    emitted = jnp.zeros((B,), jnp.int32)
    for i in range(n_chunks):
        x = feats if i == 0 else jnp.asarray(
            rng.standard_normal(feats.shape).astype(np.float32))
        toks, n, enc, dec = _batch_step(
            params, cfg, jnp.asarray(x), jnp.asarray(valid), enc, dec, emitted,
            jnp.full((B,), cfg.cache_drop_size, jnp.int32),
            jnp.full((B,), cfg.valid_out_len, jnp.int32),
            drop_extra=cfg.drop_extra_pre_encoded,
            max_tokens=max_tokens)
        emitted = emitted + n
        outs.append((np.asarray(toks), np.asarray(n)))
    return outs, enc, dec


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_batch_step_sharded_token_exact(model, dp, tp):
    """dp(-x-tp)-sharded inference == unsharded, token for token."""
    cfg = model.cfg
    feats, valid, _ = _inputs(cfg)

    enc0, dec0 = _fresh_states(model)
    ref, enc_ref, dec_ref = _run(model, model.params, feats, valid, enc0, dec0)

    mesh = make_mesh(dp=dp, tp=tp)
    params_s = shard_params(model.params, mesh)
    enc1, dec1 = _fresh_states(model)
    enc1 = jax.device_put(enc1, encoder_state_shardings(mesh))
    dec1 = jax.device_put(dec1, decode_state_shardings(mesh))
    feats_s = jax.device_put(feats, batch_sharding(mesh, 3))
    valid_s = jax.device_put(valid, batch_sharding(mesh, 1))
    got, enc_got, dec_got = _run(model, params_s, feats_s, valid_s, enc1, dec1)

    for (rt, rn), (gt, gn) in zip(ref, got):
        np.testing.assert_array_equal(rn, gn)
        for b in range(B):
            np.testing.assert_array_equal(rt[b, : rn[b]], gt[b, : gn[b]])
    np.testing.assert_array_equal(np.asarray(enc_ref.cache_len),
                                  np.asarray(enc_got.cache_len))
    np.testing.assert_array_equal(np.asarray(dec_ref.y_id), np.asarray(dec_got.y_id))
    # state itself must stay numerically on-track (bounded float reassociation)
    np.testing.assert_allclose(np.asarray(dec_ref.g), np.asarray(dec_got.g),
                               rtol=1e-5, atol=1e-5)


def test_train_step_dp_tp_matches_single_device(model):
    """dp x tp training step reproduces single-device loss/grad-norm."""
    from trt_asr_tpu.train import make_train_step
    from trt_asr_tpu.train.train_step import Batch

    cfg = model.cfg
    rng = np.random.default_rng(3)
    t, u = 57, 6
    batch = Batch(
        feats=rng.standard_normal((B, t, cfg.feat_in)).astype(np.float32),
        feat_len=np.full((B,), t, np.int32),
        labels=rng.integers(0, cfg.vocab_size, size=(B, u)).astype(np.int32),
        label_len=np.full((B,), u, np.int32),
    )
    init_opt, train_step = make_train_step(cfg)

    def run(params, batch_):
        opt_state = init_opt(params)
        step = jax.jit(train_step)
        _, _, metrics = step(params, opt_state, batch_)
        return float(np.asarray(metrics["loss"])), float(np.asarray(metrics["grad_norm"]))

    loss0, gn0 = run(model.params, batch)

    mesh = make_mesh(dp=4, tp=2)
    with mesh:
        loss1, gn1 = run(shard_params(model.params, mesh), shard_batch(batch, mesh))

    assert np.isclose(loss0, loss1, rtol=1e-4), (loss0, loss1)
    assert np.isclose(gn0, gn1, rtol=1e-3), (gn0, gn1)
