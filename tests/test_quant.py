"""Int8 weight-only quantization: exactness of the fused-dequant matmul,
scoped param-tree transform, closed-loop accuracy bounds, and session
integration (TRT_ASR_QUANT surface).

The accuracy ladder claim (ops/quant.py): (x @ q) * s == x @ (q * s)
exactly, int8->bf16 conversion exact, so the only error vs float weights is
the weight rounding itself — bounded per output channel by amax/254."""

import os
import subprocess
import sys

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.models.parakeet import init_params
from trt_asr_tpu.models.parakeet.quant import (
    dequantize_params,
    is_quantized,
    quantize_params,
)
from trt_asr_tpu.ops.quant import QuantTensor, dequantize, q8_matmul, quantize_tensor

# The encoder-closed-loop and joint-bound tests compile mid-size programs
# and have segfaulted XLA-CPU twice at suite position ~72% (r5; same
# class as docs/DEBUGGING.md trap #6 — late-suite XLA-CPU compiles in a
# long-lived process; both pass alone). They run via the subprocess
# wrapper below; TRT_ASR_QUANT_SUBPROC=1 marks the isolated process.
_IN_SUBPROC = os.environ.get("TRT_ASR_QUANT_SUBPROC") == "1"
_isolated = pytest.mark.skipif(
    not _IN_SUBPROC,
    reason="runs subprocess-isolated (trap #6); see "
           "test_compile_heavy_quant_bounds_subprocess")


def test_quantize_roundtrip_bound(rng):
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.07
    import jax.numpy as jnp

    t = quantize_tensor(jnp.asarray(w))
    assert t.q.dtype == jnp.int8 and t.s.shape == (1, 128)
    back = np.asarray(dequantize(t))
    # symmetric 127-level rounding: per-channel error <= scale/2
    bound = np.asarray(t.s)[0] / 2 + 1e-9
    assert (np.abs(back - w) <= bound[None, :]).all()


def test_q8_matmul_equals_dequant_matmul(rng):
    """(x @ q) * s must equal x @ dequant(q,s) with the SAME activation
    rounding — scale-after-matmul is exact, not approximate."""
    import jax.numpy as jnp

    w = rng.standard_normal((64, 96)).astype(np.float32) * 0.1
    x = rng.standard_normal((8, 64)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w))
    got = np.asarray(q8_matmul(jnp.asarray(x), t))
    wq_bf = np.asarray(t.q).astype(np.float32)  # int8 exact in bf16
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    want = (xb @ wq_bf) * np.asarray(t.s)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # bf16 activations path returns bf16
    got16 = q8_matmul(jnp.asarray(x, jnp.bfloat16), t)
    assert got16.dtype == jnp.bfloat16


def test_matmul_dispatch(rng):
    from trt_asr_tpu.ops.common import matmul

    import jax.numpy as jnp

    w = rng.standard_normal((32, 48)).astype(np.float32) * 0.2
    x = rng.standard_normal((4, 32)).astype(np.float32)
    t = quantize_tensor(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(matmul(jnp.asarray(x), t)),
                               np.asarray(q8_matmul(jnp.asarray(x), t)))


def test_scoped_quantize_params():
    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=1)
    q_joint = quantize_params(params, "joint")
    assert is_quantized(q_joint, "joint") and not is_quantized(q_joint, "encoder")
    q_all = quantize_params(params, "all")
    assert is_quantized(q_all, "joint") and is_quantized(q_all, "encoder")
    # biases and norm leaves untouched and shared
    assert q_all["joint"]["out"]["b"] is params["joint"]["out"]["b"]
    assert q_all["encoder"]["layers"]["ff1_ln_g"] is params["encoder"]["layers"]["ff1_ln_g"]
    assert q_all["predictor"] is params["predictor"]
    # dequantize_params restores plain arrays
    d = dequantize_params(q_all)
    assert not isinstance(d["joint"]["out"]["w"], QuantTensor)


@_isolated
def test_quantized_encoder_closed_loop_error(rng):
    """Streaming encode with int8 encoder weights must track the f32 model
    within the weight-rounding error class (and must NOT diverge as the
    cache feeds back — the reference's drift failure mode)."""
    from trt_asr_tpu.models.parakeet import encode, init_encoder_state
    from trt_asr_tpu.streaming import build_schedule

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=4)
    qparams = quantize_params(params, "encoder")
    total = 170
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total, cfg)
    s_f, s_q = init_encoder_state(cfg, 1), init_encoder_state(cfg, 1)
    errs = []
    for spec in sched:
        x = feats[spec.slice_start : spec.slice_end]
        if x.shape[0] < spec.frames:
            x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
        x, valid = x[None], np.array([spec.valid_frames], np.int32)
        cache_drop = 0 if spec.is_last else cfg.cache_drop_size
        e_f, l_f, s_f = encode(params, cfg, x, valid, s_f,
                               drop_extra=spec.drop_extra, cache_drop=cache_drop)
        e_q, l_q, s_q = encode(qparams, cfg, x, valid, s_q,
                               drop_extra=spec.drop_extra, cache_drop=cache_drop)
        n = int(np.asarray(l_f)[0])
        errs.append(np.abs(np.asarray(e_q)[0, :n] - np.asarray(e_f)[0, :n]).max())
    # closed loop must stay bounded, not drift chunk-over-chunk
    assert max(errs) < 0.08, f"int8 closed-loop error too large: {max(errs)}"
    assert errs[-1] < 3 * (np.mean(errs) + 1e-6), f"drift: {errs}"


@_isolated
def test_joint_logits_error_bound(rng):
    """Quantized joint logits track float within the int8 error class —
    the decode loop sees fp16-class logits, not garbage."""
    import jax.numpy as jnp

    from trt_asr_tpu.models.parakeet.joint import joint_single_step

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=7)
    qj = quantize_params(params, "joint")
    enc_t = jnp.asarray(rng.standard_normal((4, cfg.d_model)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((4, cfg.pred_hidden)).astype(np.float32))
    lf = np.asarray(joint_single_step(params["joint"], enc_t, g))
    lq = np.asarray(joint_single_step(qj["joint"], enc_t, g))
    err = np.abs(lf - lq).max()
    assert err < 0.05 * np.abs(lf).max(), f"joint logits err {err}"


def test_session_quant_runs_end_to_end(rng):
    """TRT_ASR_QUANT surface: a fully-quantized session (encoder + joint)
    streams end-to-end and produces a transcript. Transcript EQUALITY with
    float is not required — int8 is lossy and a random tiny model has no
    decision margins; decode-quality impact is bounded by the logit-error
    test above and measured on real weights by the parity ladder."""
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.session import EventType, StreamingSession

    t = np.arange(24000)
    audio = (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
             + 0.1 * rng.standard_normal(24000)).astype(np.float32)
    model_q = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    model_q.runtime = RuntimeConfig(quant="all")
    model_q.params = quantize_params(model_q.params, "all")
    assert is_quantized(model_q.params, "joint")
    sess = StreamingSession(model_q, model_q.runtime)
    for s in range(0, len(audio), 8000):
        sess.push_audio(audio[s : s + 8000])
    sess.finalize()
    events = []
    while (ev := sess.poll_event()) is not None:
        events.append(ev)
    assert events and events[-1].type == EventType.FINAL_TEXT
    assert sess.text


def test_compile_heavy_quant_bounds_subprocess():
    """Runs the two compile-heavy quant-accuracy tests in a fresh
    interpreter (docs/DEBUGGING.md trap #6: XLA-CPU segfaults
    non-deterministically on late-suite compiles in a long-lived process;
    both tests crashed the r5 suite at ~72% twice and pass alone)."""
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         f"{__file__}::test_quantized_encoder_closed_loop_error",
         f"{__file__}::test_joint_logits_error_bound"],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "TRT_ASR_QUANT_SUBPROC": "1"})
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-500:])
