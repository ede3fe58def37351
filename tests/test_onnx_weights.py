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
    assert set(paths) == {"encoder", "encoder_streaming", "predictor", "joint"}
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


def _reference_style_fixture(cfg, params, out, streaming=True):
    """Build an ONNX export dir mimicking the REAL reference export exactly
    (tools/export_onnx/export.py:614-820): wrapper-prefixed initializer
    names ('predictor.prediction.*' from PredictorWrapper.predictor,
    'joint.*' from JointWrapper.joint, unprefixed offline encoder /
    'encoder.*' streaming), reference IO signatures, and the reference
    model_meta.json schema (:970-997)."""
    import json

    from trt_asr_tpu.io.onnx_weights import (
        STREAMING_ENCODER_INPUTS,
        STREAMING_ENCODER_OUTPUTS,
        _get_path,
        encoder_name_map,
        joint_name_map,
        predictor_name_map,
    )

    os.makedirs(out, exist_ok=True)
    enc_map = encoder_name_map(cfg)
    # offline encoder: exported unwrapped -> no prefix
    inits = {n.split(".", 1)[1]: f(_get_path(params, p)).astype(np.float32)
             for p, n, f, _ in enc_map}
    write_onnx(os.path.join(out, "encoder.onnx"), "main_graph", inits,
               ["audio_signal", "length"], ["encoder_output", "encoded_lengths"])
    if streaming:
        inits = {n: f(_get_path(params, p)).astype(np.float32)
                 for p, n, f, _ in enc_map}
        write_onnx(os.path.join(out, "encoder_streaming.onnx"), "main_graph",
                   inits, STREAMING_ENCODER_INPUTS, STREAMING_ENCODER_OUTPUTS)
    # predictor: PredictorWrapper attribute prefix 'predictor.'
    inits = {"predictor." + n: f(_get_path(params, p)).astype(np.float32)
             for p, n, f, _ in predictor_name_map(cfg)}
    write_onnx(os.path.join(out, "predictor.onnx"), "main_graph", inits,
               ["y", "h", "c"], ["g", "h_out", "c_out"])
    inits = {n: f(_get_path(params, p)).astype(np.float32)
             for p, n, f, _ in joint_name_map(cfg)}
    write_onnx(os.path.join(out, "joint.onnx"), "main_graph", inits,
               ["encoder_output", "predictor_output"], ["joint_output"])
    meta = {
        "model_name": "parakeet-tdt-0.6b-v3",
        "sample_rate": 16000,
        "labels": [],
        "blank_id": cfg.blank_id,
        "tokenizer_vocab_size": cfg.vocab_size,
        "joint_vocab_size": cfg.joint_vocab_size,
        "duration_values": list(cfg.duration_values),
        "torch_version": "2.9.1+cu128",
        "tensor_layout_contract": {},
        "features": {"type": "log-mel", "n_fft": 512, "n_mels": cfg.feat_in,
                     "hop_length": 160},
    }
    with open(os.path.join(out, "model_meta.json"), "w") as f:
        json.dump(meta, f)


@pytest.mark.parametrize("streaming", [True, False])
def test_reference_export_fixture_loads_strict(tmp_path, streaming):
    """A drop-in real Parakeet export (reference naming, wrapper prefixes,
    reference meta schema) loads strictly with ZERO overrides — both with
    the streaming encoder component present and offline-only."""
    import jax

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=5)
    out = str(tmp_path / "ref_export")
    _reference_style_fixture(cfg, params, out, streaming=streaming)

    loaded = load_params_from_onnx(cfg, out)  # strict, no override map
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_read_model_meta_both_schemas(tmp_path):
    from trt_asr_tpu.io.onnx_weights import read_model_meta

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=0)
    ours = str(tmp_path / "ours")
    export_params_to_onnx(params, cfg, ours, external_threshold=None)
    m = read_model_meta(ours)
    assert m["vocab_size"] == cfg.vocab_size and m["blank_id"] == cfg.blank_id
    assert m["joint_vocab_size"] == cfg.joint_vocab_size
    assert m["n_mels"] == cfg.feat_in

    ref = str(tmp_path / "ref")
    _reference_style_fixture(cfg, params, ref)
    m = read_model_meta(ref)
    assert m["vocab_size"] == cfg.vocab_size
    assert m["duration_values"] == list(cfg.duration_values)

    # cross-field arithmetic is enforced (contract-style validation)
    import json

    bad = dict(json.load(open(os.path.join(ref, "model_meta.json"))))
    bad["joint_vocab_size"] = bad["joint_vocab_size"] + 1
    baddir = str(tmp_path / "bad")
    os.makedirs(baddir)
    json.dump(bad, open(os.path.join(baddir, "model_meta.json"), "w"))
    with pytest.raises(ValueError, match="joint_vocab_size"):
        read_model_meta(baddir)


def test_onnx_graph_exec_parity(tmp_path, rng):
    """The exported predictor/joint graphs must be EXECUTABLE programs:
    the pure-numpy interpreter (tools/onnx_exec.py — op-level-independent
    of both JAX and the torch oracle) runs them and reproduces the JAX
    logits at 1e-5 (reference export's ORT-smoke role,
    tools/export_onnx/export.py:819-852)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.onnx_exec import run_graph

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=5)
    out = str(tmp_path / "export")
    export_params_to_onnx(params, cfg, out, external_threshold=None)

    B, U, T = 2, 4, 6
    y = rng.integers(0, cfg.vocab_size, (B, U)).astype(np.int32)
    h = rng.standard_normal((cfg.pred_rnn_layers, B, cfg.pred_hidden)).astype(np.float32)
    c = rng.standard_normal((cfg.pred_rnn_layers, B, cfg.pred_hidden)).astype(np.float32)

    pred_model = read_onnx(os.path.join(out, "predictor.onnx"))
    assert pred_model.nodes, "predictor.onnx must carry compute nodes"
    assert "LSTM" in pred_model.node_ops
    got = run_graph(pred_model, {"y": y, "h": h, "c": c})

    from trt_asr_tpu.models.parakeet.predictor import predictor_sequence

    g_jax, h_jax, c_jax = predictor_sequence(params["predictor"], y, h, c)
    np.testing.assert_allclose(got["g"], np.transpose(np.asarray(g_jax), (0, 2, 1)),
                               atol=1e-5)
    np.testing.assert_allclose(got["h_out"], np.asarray(h_jax), atol=1e-5)
    np.testing.assert_allclose(got["c_out"], np.asarray(c_jax), atol=1e-5)

    joint_model = read_onnx(os.path.join(out, "joint.onnx"))
    assert joint_model.nodes, "joint.onnx must carry compute nodes"
    assert "LogSoftmax" not in joint_model.node_ops  # raw logits contract
    enc = rng.standard_normal((B, cfg.d_model, T)).astype(np.float32)
    pred = rng.standard_normal((B, cfg.pred_hidden, U)).astype(np.float32)
    got_j = run_graph(joint_model, {"encoder_output": enc, "predictor_output": pred})

    from trt_asr_tpu.models.parakeet.joint import joint_apply

    want = joint_apply(params["joint"], np.transpose(enc, (0, 2, 1)),
                       np.transpose(pred, (0, 2, 1)))
    assert got_j["joint_output"].shape == (B, T, U, cfg.joint_vocab_size)
    np.testing.assert_allclose(got_j["joint_output"], np.asarray(want), atol=1e-5)


def test_onnx_encoder_graph_exec_parity(tmp_path, rng):
    """encoder.onnx must ALSO be an executable program (r3: the VERDICT's
    remaining export gap): the numpy interpreter runs the full offline
    conformer graph — dw_striding subsample, rel-pos attention with the
    Transformer-XL shift, GLU conv module, macaron FFNs — and reproduces
    offline_encode at 1e-4. Static input length per model_meta's
    encoder_static_t_in."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from tools.onnx_exec import run_graph

    from trt_asr_tpu.models.parakeet import offline_encode

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=6)
    out = str(tmp_path / "export")
    t_in = 99  # odd, not a multiple of 8: exercises the ceil length chain
    export_params_to_onnx(params, cfg, out, external_threshold=None,
                          encoder_t_in=t_in)

    meta = json.load(open(os.path.join(out, "model_meta.json")))
    assert meta["encoder_static_t_in"] == t_in

    model = read_onnx(os.path.join(out, "encoder.onnx"))
    assert model.nodes, "encoder.onnx must carry compute nodes"
    for op in ("Conv", "Softmax", "LayerNormalization", "BatchNormalization"):
        assert op in model.node_ops, op

    feats = rng.standard_normal((1, t_in, cfg.feat_in)).astype(np.float32)
    got = run_graph(model, {
        "audio_signal": np.transpose(feats, (0, 2, 1)),
        "length": np.array([t_in], np.int64)})

    enc, out_len = offline_encode(params, cfg, feats,
                                  np.array([t_in], np.int32))
    t_enc = int(np.asarray(out_len)[0])
    assert got["encoded_lengths"][0] == t_enc
    assert got["encoder_output"].shape == (1, cfg.d_model, t_enc)
    np.testing.assert_allclose(
        got["encoder_output"],
        np.transpose(np.asarray(enc)[:, :t_enc], (0, 2, 1)),
        atol=1e-4)

    # length-exactness (batch-padding semantics, as a fixed-shape TRT
    # profile serves short utterances): a SHORTER utterance zero-padded to
    # the static t_in with the true length passed must match offline_encode
    # given the SAME padded input and length — the in-graph masking mirrors
    # the runtime's time_mask (encoder.py:240,:362,:370). short=70 makes an
    # intermediate subsample length odd, the case where the pre-encode
    # boundary actually reads a padded frame.
    short = 70
    feats_s = np.zeros_like(feats)
    feats_s[:, :short] = feats[:, :short]
    got_s = run_graph(model, {
        "audio_signal": np.transpose(feats_s, (0, 2, 1)),
        "length": np.array([short], np.int64)})
    enc_s, out_len_s = offline_encode(params, cfg, feats_s,
                                      np.array([short], np.int32))
    t_s = int(np.asarray(out_len_s)[0])
    assert int(got_s["encoded_lengths"][0]) == t_s
    np.testing.assert_allclose(
        got_s["encoder_output"][:, :, :t_s],
        np.transpose(np.asarray(enc_s)[:, :t_s], (0, 2, 1)),
        atol=1e-4)


def test_attribute_proto3_default_omitted():
    """proto3 serializers (onnx, torch.onnx) OMIT scalar attribute values
    equal to the default — Gather(axis=0) arrives as name + type only. The
    parser must materialize the typed default, not None (r3 review: int(None)
    crashed the interpreter on third-party files)."""
    from trt_asr_tpu.io.onnx_lite import _parse_attribute

    def varint(v):
        out = b""
        while True:
            b7, v = v & 0x7F, v >> 7
            if v:
                out += bytes([b7 | 0x80])
            else:
                return out + bytes([b7])

    def enc_str(fno, s):
        return varint((fno << 3) | 2) + varint(len(s)) + s.encode()

    def enc_varint(fno, v):
        return varint((fno << 3) | 0) + varint(v)

    # AttributeProto { name: "axis" (field 1), type: INT=2 (field 20) }
    buf = enc_str(1, "axis") + enc_varint(20, 2)
    name, val = _parse_attribute(buf, ".")
    assert name == "axis" and val == 0 and isinstance(val, int)

    # FLOAT type with omitted value -> 0.0
    buf = enc_str(1, "alpha") + enc_varint(20, 1)
    assert _parse_attribute(buf, ".") == ("alpha", 0.0)

    # explicit non-default value still parses
    buf = enc_str(1, "axis") + enc_varint(3, 2) + enc_varint(20, 2)
    assert _parse_attribute(buf, ".") == ("axis", 2)


def test_onnx_streaming_encoder_graph_closed_loop(tmp_path, rng):
    """encoder_streaming.onnx must be an executable cache-aware chunk step:
    run FIVE closed-loop steady chunks through the pure-numpy interpreter,
    feeding each step the graph's OWN cache outputs, and match the runtime
    encoder (encode(state) + state_to_contract) on the encoder output AND
    every cache tensor at 1e-4 — including pre- and post-saturation of the
    attention cache (tiny capacity 8 saturates at chunk 3)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import jax
    import jax.numpy as jnp

    from tools.onnx_exec import run_graph

    from trt_asr_tpu.models.parakeet.encoder import (encode,
                                                     init_encoder_state,
                                                     state_to_contract)

    cfg = ModelConfig.tiny(att_cache_size=8)  # saturates within the test
    params = init_params(cfg, seed=9)
    out = str(tmp_path / "export")
    export_params_to_onnx(jax.tree.map(np.asarray, params), cfg, out,
                          external_threshold=None, encoder_t_in=57)
    model = read_onnx(os.path.join(out, "encoder_streaming.onnx"))
    assert model.nodes, "encoder_streaming.onnx must carry compute nodes"

    window = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
    lead = window - cfg.chunk_size_frames[0]
    shift = cfg.shift_size_frames[1]
    feats = rng.standard_normal((window + shift * 5, cfg.feat_in)) \
        .astype(np.float32)
    fpad = np.pad(feats, ((lead, 0), (0, 0)))

    state = init_encoder_state(cfg, 1)
    graph_cache = {
        "cache_last_channel": np.zeros(
            (1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32),
        "cache_last_time": np.zeros(
            (1, cfg.num_layers, cfg.d_model, cfg.conv_context_size),
            np.float32),
        "cache_last_channel_len": np.zeros((1,), np.int64),
    }
    for k in range(5):
        win = fpad[k * shift: k * shift + window]
        # runtime step (steady-chunk semantics; unified program)
        enc, out_len, state = encode(
            params, cfg, jnp.asarray(win[None]),
            jnp.asarray([window], jnp.int32), state,
            drop_extra=cfg.drop_extra_pre_encoded,
            cache_drop=cfg.cache_drop_size, valid_cap=cfg.valid_out_len)
        want_contract = jax.tree.map(np.asarray, state_to_contract(state))

        got = run_graph(model, {
            "audio_signal": win.T[None], "length": np.array([window], np.int64),
            **graph_cache})
        t_post = int(got["encoded_lengths"][0])
        np.testing.assert_allclose(
            got["encoder_output"][0].T, np.asarray(enc)[0, :t_post],
            atol=1e-4, err_msg=f"chunk {k} encoder output")
        np.testing.assert_array_equal(
            got["cache_last_channel_len_out"],
            np.asarray(want_contract["cache_last_channel_len"]),
            err_msg=f"chunk {k} cache len")
        np.testing.assert_allclose(
            got["cache_last_channel_out"],
            np.asarray(want_contract["cache_last_channel"]), atol=1e-4,
            err_msg=f"chunk {k} channel cache")
        np.testing.assert_allclose(
            got["cache_last_time_out"],
            np.asarray(want_contract["cache_last_time"]), atol=1e-4,
            err_msg=f"chunk {k} time cache")
        graph_cache = {
            "cache_last_channel": got["cache_last_channel_out"],
            "cache_last_time": got["cache_last_time_out"],
            "cache_last_channel_len": got["cache_last_channel_len_out"],
        }


def test_cache_provenance_tracer(tmp_path, rng, capsys):
    """tools/inspect_onnx/trace_cache_provenance.py (reference
    tools/onnxruntime/inspect_streaming_cache_graph.py:49-104): every cache
    output of the exported streaming graph must transitively depend on the
    fresh chunk AND its carried-in cache tensor. Positive case on a real
    tiny export; negative case on a tampered graph whose time cache is a
    pass-through Identity (the reference's frozen-cache failure mode)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from trt_asr_tpu.io.onnx_lite import OnnxNode
    from tools.inspect_onnx.trace_cache_provenance import main as trace_main

    cfg = ModelConfig.tiny(att_cache_size=8)
    params = init_params(cfg, seed=3)
    out = str(tmp_path / "export")
    export_params_to_onnx(params, cfg, out, external_threshold=None,
                          encoder_t_in=57)

    argv = sys.argv
    try:
        sys.argv = ["x", out, "--quiet"]
        assert trace_main() == 0
        capsys.readouterr()

        # tamper: cache_last_time_out becomes Identity(cache_last_time)
        good = read_onnx(os.path.join(out, "encoder_streaming.onnx"))
        keep = [n for n in good.nodes
                if "cache_last_time_out" not in n.outputs]
        keep.append(OnnxNode("Identity", ["cache_last_time"],
                             ["cache_last_time_out"], "frozen_tc"))
        bad = str(tmp_path / "bad.onnx")
        write_onnx(bad, "enc_stream_bad",
                   {k: v.array for k, v in good.initializers.items()},
                   inputs=good.inputs, outputs=good.outputs, nodes=keep)
        sys.argv = ["x", bad, "--quiet"]
        assert trace_main() == 1
        assert "does not depend on audio_signal" in capsys.readouterr().out

        # tamper: len output frozen to a pass-through of the len input —
        # still "depends on" it, so only the advancing-ops check catches it
        keep2 = [n for n in good.nodes
                 if "cache_last_channel_len_out" not in n.outputs]
        keep2.append(OnnxNode("Identity", ["cache_last_channel_len"],
                              ["cache_last_channel_len_out"], "frozen_len"))
        bad2 = str(tmp_path / "bad_len.onnx")
        write_onnx(bad2, "enc_stream_bad_len",
                   {k: v.array for k, v in good.initializers.items()},
                   inputs=good.inputs, outputs=good.outputs, nodes=keep2)
        sys.argv = ["x", bad2, "--quiet"]
        assert trace_main() == 1
        assert "no advancing arithmetic" in capsys.readouterr().out

        # tamper: len output is Clip(len_in) — a bounding op that still
        # never advances the length; a non-pass-through-only check would
        # wrongly certify this as healthy
        len_clip = [n for n in good.nodes
                    if "cache_last_channel_len_out" not in n.outputs]
        cap = np.asarray([cfg.att_cache_size], dtype=np.int64)
        len_clip.append(OnnxNode("Clip",
                                 ["cache_last_channel_len", "len_zero_c",
                                  "len_cap_c"],
                                 ["cache_last_channel_len_out"],
                                 "bounded_frozen_len"))
        inits3 = {k: v.array for k, v in good.initializers.items()}
        inits3["len_zero_c"] = np.asarray([0], dtype=np.int64)
        inits3["len_cap_c"] = cap
        bad3 = str(tmp_path / "bad_len_clip.onnx")
        write_onnx(bad3, "enc_stream_bad_len_clip", inits3,
                   inputs=good.inputs, outputs=good.outputs, nodes=len_clip)
        sys.argv = ["x", bad3, "--quiet"]
        assert trace_main() == 1
        assert "no advancing arithmetic" in capsys.readouterr().out
    finally:
        sys.argv = argv


def test_import_onnx_model_tool_roundtrip(tmp_path):
    """One-command real-weights path (tools/import_onnx_model.py): model dir
    -> ONNX export dir -> imported model dir must transcribe token-exactly.
    The export's meta carries the complete ModelConfig, so the import needs
    no out-of-band architecture knowledge."""
    import subprocess
    import sys

    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.session import StreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=3)
    src = tmp_path / "src"
    model.save_model_dir(str(src))
    repo = __file__.rsplit("/tests/", 1)[0]
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": repo}
    exp = tmp_path / "export"
    r = subprocess.run([sys.executable, f"{repo}/tools/export_onnx/export.py",
                        "--model-dir", str(src), "--outdir", str(exp)],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    assert (exp / "vocab.txt").exists()  # tokenizer asset next to the graphs
    imp = tmp_path / "imported"
    r = subprocess.run([sys.executable, f"{repo}/tools/import_onnx_model.py",
                        str(exp), "--out", str(imp)],
                       capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]

    rng = np.random.default_rng(0)
    audio = (0.15 * rng.standard_normal(24000)).astype(np.float32)
    a = StreamingSession(model)
    a.push_audio(audio)
    a.finalize()
    b = StreamingSession(ParakeetTDT.from_model_dir(str(imp)))
    b.push_audio(audio)
    b.finalize()
    assert a._tokens == b._tokens
