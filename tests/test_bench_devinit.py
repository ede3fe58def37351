"""bench.py's device-side param generator (VERDICT r4 #6): the generated
tree must be a drop-in for host init_params — same structure, shapes,
dtypes, and per-leaf scale — and drive the fused step."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import init_params


@pytest.fixture(scope="module")
def pair():
    from bench import _device_init_params

    cfg = ModelConfig.tiny()
    return cfg, _device_init_params(cfg, seed=0), init_params(cfg, seed=0)


def test_tree_structure_shapes_dtypes(pair):
    cfg, dev, host = pair
    ld, td = jax.tree_util.tree_flatten(dev)
    lh, th = jax.tree_util.tree_flatten(host)
    assert td == th
    for a, b in zip(ld, lh):
        assert a.shape == b.shape
        assert a.dtype == np.float32


def test_leaf_scales_match_host(pair):
    cfg, dev, host = pair
    for a, b in zip(jax.tree_util.tree_leaves(dev),
                    jax.tree_util.tree_leaves(host)):
        sb = float(np.std(b))
        if sb > 1e-6 and b.size > 100:
            sa = float(np.std(np.asarray(a)))
            assert abs(sa - sb) / sb < 0.35, (b.shape, sa, sb)


def test_drives_the_fused_step(pair):
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.models.parakeet import init_encoder_state
    from trt_asr_tpu.streaming.batch_engine import _batch_step

    cfg, dev, _ = pair
    frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    out = _batch_step(
        dev, cfg, jnp.zeros((1, frames, cfg.feat_in)),
        jnp.full((1,), frames, jnp.int32),
        init_encoder_state(cfg, 1), init_decode_state(cfg, 1),
        jnp.zeros((1,), jnp.int32),
        jnp.full((1,), cfg.cache_drop_size, jnp.int32),
        jnp.full((1,), cfg.valid_out_len, jnp.int32),
        drop_extra=cfg.drop_extra_pre_encoded, max_tokens=16)
    assert np.isfinite(np.asarray(out[1])).all()
