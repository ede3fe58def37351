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


def _write_chain(tmp, dm, flips, wer, wer_pass=True, ratio=1.0):
    import json
    import os

    d = os.path.join(tmp, "artifacts", "parity")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(
            d, f"trained_margins_vs_int8_delta_d{dm}.json"), "w") as f:
        json.dump({"safety_ratio_emission_p5_over_delta_e2e_p95": ratio,
                   "decision_flip_rate_e2e": flips}, f)
    with open(os.path.join(d, f"int8_wer_gate_d{dm}.json"), "w") as f:
        json.dump({"wer": wer, "pass": wer_pass}, f)


def test_fast_mode_certification_gate(tmp_path):
    """The dual-arm headline promotion is gated on the committed
    decode-safety chain: at BOTH trained sizes the int8 WER gate must
    pass and the measured decision-flip rate must stay under 2%. Absent
    or regressed artifacts -> None -> the bench keeps the f32 headline."""
    from bench import _fast_mode_certified

    root = str(tmp_path)
    assert _fast_mode_certified(root) is None          # nothing committed

    _write_chain(root, 256, flips=0.0032, wer=0.0)
    assert _fast_mode_certified(root) is None          # d512 missing

    _write_chain(root, 512, flips=0.0101, wer=0.0)
    cert = _fast_mode_certified(root)
    assert [c["d_model"] for c in cert] == [256, 512]
    assert all(c["int8_wer"] <= 0.05 for c in cert)

    _write_chain(root, 512, flips=0.0101, wer=0.12)    # WER regression
    assert _fast_mode_certified(root) is None

    _write_chain(root, 512, flips=0.0101, wer=0.0, wer_pass=False)
    assert _fast_mode_certified(root) is None          # gate says fail

    _write_chain(root, 512, flips=0.05, wer=0.0)       # flip-rate regression
    assert _fast_mode_certified(root) is None


def test_fast_mode_certified_against_repo_artifacts():
    """Whatever the repo currently certifies must be internally
    consistent: either None, or a two-point chain with passing numbers."""
    from bench import _fast_mode_certified

    cert = _fast_mode_certified()
    if cert is not None:
        assert [c["d_model"] for c in cert] == [256, 512]
        for c in cert:
            assert c["int8_wer"] <= 0.05
            assert c["decision_flip_rate"] < 0.02
