"""ONNX weight interchange: wire-format reader/writer round trip, external
data handling, name-map loading, strict missing-tensor reporting."""

import os

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.io.onnx_lite import read_onnx, write_onnx
from trt_asr_tpu.io.onnx_weights import (
    export_params_to_onnx,
    load_params_from_onnx,
)
from trt_asr_tpu.models.parakeet import init_params, offline_encode


def test_wire_roundtrip(tmp_path, rng):
    tensors = {
        "small.f32": rng.standard_normal((3, 5)).astype(np.float32),
        "int.i64": np.arange(7, dtype=np.int64),
        "big.f32": rng.standard_normal((200, 300)).astype(np.float32),
    }
    p = str(tmp_path / "m.onnx")
    write_onnx(p, "g", tensors, ["in0"], ["out0"], external_threshold=1024)
    assert os.path.exists(p + ".data"), "big tensor should spill to external data"

    model = read_onnx(p)
    assert model.graph_name == "g"
    assert model.inputs == ["in0"] and model.outputs == ["out0"]
    assert set(model.initializers) == set(tensors)
    for name, want in tensors.items():
        got = model.initializers[name].array
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want)


def test_wire_roundtrip_inline_only(tmp_path, rng):
    p = str(tmp_path / "m.onnx")
    write_onnx(p, "g", {"w": rng.standard_normal((64, 64)).astype(np.float32)})
    assert not os.path.exists(p + ".data")
    model = read_onnx(p)
    assert model.initializers["w"].array.shape == (64, 64)


def test_params_onnx_roundtrip(tmp_path, rng):
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=11)
    out = str(tmp_path / "export")
    paths = export_params_to_onnx(params, cfg, out, external_threshold=4096)
    assert set(paths) == {"encoder", "predictor", "joint"}
    assert os.path.exists(os.path.join(out, "model_meta.json"))

    loaded = load_params_from_onnx(cfg, out)

    # behavior-level equivalence: identical encoder outputs
    feats = rng.standard_normal((1, 48, cfg.feat_in)).astype(np.float32)
    e1, _ = offline_encode(params, cfg, feats, np.array([48], np.int32))
    e2, _ = offline_encode(loaded, cfg, feats, np.array([48], np.int32))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)

    # tensor-level equality across the whole tree
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_missing_initializer_strict(tmp_path):
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    out = str(tmp_path / "export")
    export_params_to_onnx(params, cfg, out, external_threshold=None)
    # corrupt: rewrite joint.onnx without one tensor
    from trt_asr_tpu.io.onnx_lite import read_onnx as r, write_onnx as w

    m = r(os.path.join(out, "joint.onnx"))
    inits = {k: v.array for k, v in m.initializers.items() if k != "joint.enc.weight"}
    w(os.path.join(out, "joint.onnx"), "joint", inits)
    with pytest.raises(KeyError, match="joint.enc.weight"):
        load_params_from_onnx(cfg, out)
    loaded = load_params_from_onnx(cfg, out, strict=False)
    assert loaded is not None
