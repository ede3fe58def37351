"""Parity-ladder tools end-to-end: gen goldens (torch oracle) -> streaming
parity harness (functional + closed-loop) -> TDT trace comparison. These
are the reference's P4/P5/P8 harnesses as one pipeline."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def _run(args, **kw):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, env=ENV, timeout=600, **kw)


@pytest.fixture(scope="module")
def goldens(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("goldens"))
    out = _run([os.path.join(REPO, "tools/parity/gen_goldens.py"),
                "--out-dir", d, "--config", "tiny", "--seed", "1",
                "--chunks", "8", "--trace"])
    assert out.returncode == 0, out.stderr[-2000:]
    assert os.path.exists(os.path.join(d, "streaming_encoder_reference.jsonl"))
    assert os.path.exists(os.path.join(d, "tdt_trace.jsonl"))
    return d


def test_streaming_parity_passes(goldens, tmp_path):
    for mode in ("functional", "closedloop"):
        summary = str(tmp_path / f"{mode}.json")
        out = _run([os.path.join(REPO, "tools/parity/streaming_parity.py"),
                    "--goldens", os.path.join(goldens, "streaming_encoder_reference.jsonl"),
                    "--mode", mode, "--config", "tiny", "--seed", "1",
                    "--summary", summary])
        assert out.returncode == 0, out.stdout + out.stderr[-1000:]
        with open(summary) as f:
            s = json.load(f)
        assert s["pass_rate"] == 1.0
        assert s["encoder_output_error_distribution"]["max"] < 1e-4


def test_streaming_parity_onnx_engine(goldens, tmp_path):
    """--engine onnx: the EXPORTED encoder_streaming.onnx executed by the
    pure-numpy interpreter against the torch-oracle goldens — the
    third-implementation parity run (the reference's ORT-harness role,
    tools/onnxruntime/onnx_streaming_parity.py). Must clear the strictest
    contract rung in closed loop."""
    for mode in ("functional", "closedloop"):
        summary = str(tmp_path / f"onnx_{mode}.json")
        out = _run([os.path.join(REPO, "tools/parity/streaming_parity.py"),
                    "--goldens", os.path.join(goldens, "streaming_encoder_reference.jsonl"),
                    "--mode", mode, "--config", "tiny", "--seed", "1",
                    "--engine", "onnx", "--summary", summary])
        assert out.returncode == 0, out.stdout + out.stderr[-1000:]
        with open(summary) as f:
            s = json.load(f)
        assert s["engine"] == "onnx"
        assert s["pass_rate"] == 1.0
        assert s["best_rung"] == "ort_f32"


def test_streaming_parity_detects_mismatch(goldens, tmp_path):
    """Wrong seed -> different weights -> harness must FAIL (exit 1)."""
    out = _run([os.path.join(REPO, "tools/parity/streaming_parity.py"),
                "--goldens", os.path.join(goldens, "streaming_encoder_reference.jsonl"),
                "--mode", "functional", "--config", "tiny", "--seed", "99",
                "--fail-dump", str(tmp_path / "fail.npz")])
    assert out.returncode == 1
    assert "0/" in out.stdout or "PASS" in out.stdout
    assert os.path.exists(tmp_path / "fail.npz")


def test_tdt_trace_comparison(goldens, tmp_path):
    trace = str(tmp_path / "jax_trace.jsonl")
    out = _run([os.path.join(REPO, "tools/parity/jax_tdt_trace.py"),
                "--out", trace, "--config", "tiny", "--seed", "1",
                "--frames", "150"])
    assert out.returncode == 0, out.stderr[-1000:]
    # regenerate a matching oracle trace at the same frame count
    gold2 = str(tmp_path / "g2")
    out = _run([os.path.join(REPO, "tools/parity/gen_goldens.py"),
                "--out-dir", gold2, "--config", "tiny", "--seed", "1",
                "--chunks", "6", "--trace"])
    assert out.returncode == 0
    # hand-roll the oracle trace at 150 frames for an exact match
    sys.path.insert(0, REPO)
    from tools.parity.gen_goldens import gen_tdt_trace
    from oracle.torch_parakeet import TorchParakeet
    from trt_asr_tpu.config import ModelConfig
    from trt_asr_tpu.models.parakeet.params import init_params

    cfg = ModelConfig.tiny()
    oracle = TorchParakeet(cfg, init_params(cfg, seed=1))
    gtrace = str(tmp_path / "oracle_trace.jsonl")
    gen_tdt_trace(cfg, oracle, 150, 0, gtrace)

    out = _run([os.path.join(REPO, "tools/parity/compare_tdt_trace.py"),
                gtrace, trace])
    assert out.returncode == 0, out.stdout
    assert "IDENTICAL" in out.stdout

    # and the comparator detects a divergence
    lines = open(trace).read().splitlines()
    rec = json.loads(lines[5])
    rec["best_tok"] = (rec["best_tok"] + 1) % 7
    lines[5] = json.dumps(rec)
    bad = str(tmp_path / "bad.jsonl")
    open(bad, "w").write("\n".join(lines))
    out = _run([os.path.join(REPO, "tools/parity/compare_tdt_trace.py"), gtrace, bad])
    assert out.returncode == 1
    assert "FIRST DIVERGENCE" in out.stdout


class TestCacheDiagnostics:
    """The three forensic checks that localized the reference's
    cache_last_time drift (diagnose_cache_time_mismatch.py,
    ort_cache_sensitivity.py) — see tools/parity/cache_diagnostics.py."""

    def test_per_axis_detects_padding_side(self):
        from tools.parity.cache_diagnostics import masked_error, per_axis_error

        rng = np.random.default_rng(0)
        ref = rng.standard_normal((1, 2, 16, 4)).astype(np.float32)
        ref[..., 3] = 0.0                      # padding slot
        got = ref.copy()
        got[..., 3] += 0.5                     # junk only in the padding slot
        r = per_axis_error(got, ref, axis=3, verbose=False)
        assert r["interpretation"] == "padding_side_mismatch" and r["worst"] == 3
        m = masked_error(got, ref, threshold=1e-3, verbose=False)
        assert m["interpretation"] == "padding_junk"

        got2 = ref + 0.01 * rng.standard_normal(ref.shape).astype(np.float32)
        r2 = per_axis_error(got2, ref, axis=3, verbose=False)
        assert r2["interpretation"] in ("uniform_error", "mixed")
        m2 = masked_error(got2, ref, verbose=False)
        assert m2["interpretation"] == "real_error"

    def test_cache_sensitivity_classifies(self):
        """After warm chunks both caches must be strongly sensitive (they
        feed attention/conv); perturbing proves the wiring is live — the
        reference used this to show its cache_time mismatch was blocking."""
        import jax.numpy as jnp

        from tools.parity.cache_diagnostics import cache_sensitivity
        from trt_asr_tpu.config import ModelConfig
        from trt_asr_tpu.models.parakeet import (
            encode, init_encoder_state, init_params)
        from trt_asr_tpu.streaming import build_schedule
        from trt_asr_tpu.streaming.schedule import extract_chunk

        cfg = ModelConfig.tiny()
        params = init_params(cfg, seed=1)
        rng = np.random.default_rng(1)
        feats = (0.5 * rng.standard_normal((180, cfg.feat_in))).astype(np.float32)
        sched = build_schedule(180, cfg)
        state = init_encoder_state(cfg, 1)
        for spec in sched[:4]:
            x = extract_chunk(feats, spec)
            _, _, state = encode(params, cfg, jnp.asarray(x[None]),
                                 np.asarray([spec.valid_frames], np.int32),
                                 state, drop_extra=spec.drop_extra,
                                 cache_drop=cfg.cache_drop_size)
        spec = sched[4]
        x = extract_chunk(feats, spec)[None]
        for which in ("time", "channel"):
            r = cache_sensitivity(params, cfg, x, spec.valid_frames, state,
                                  which=which, drop_extra=spec.drop_extra,
                                  cache_drop=cfg.cache_drop_size, verbose=False)
            assert r["interpretation"] == "strongly_sensitive", r
        # zeroing cache_len invalidates the history -> also a live input
        r = cache_sensitivity(params, cfg, x, spec.valid_frames, state,
                              which="len", drop_extra=spec.drop_extra,
                              cache_drop=cfg.cache_drop_size,
                              noise_scales=(), verbose=False)
        assert r["max_effect"] > 1e-3


def test_trace_topk_fields(tmp_path):
    """--trace-topk adds per-step top-k token logits + logsumexp (reference
    tdt_trace.py / PARAKEET_DEBUG_JOINT_TOPK parity)."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity", "gen_goldens.py"),
         "--out-dir", str(tmp_path), "--config", "tiny", "--seed", "1",
         "--chunks", "2", "--trace", "--trace-topk", "3"],
        capture_output=True, text=True,
        env={**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"},
        timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    recs = [json.loads(l) for l in open(tmp_path / "tdt_trace.jsonl")]
    steps = [r for r in recs if r.get("type") == "step"]
    assert steps and all(len(r["topk"]) == 3 and "logsumexp" in r for r in steps)
    # topk[0] must be the argmax the decode actually took
    assert all(r["topk"][0][0] == r["best_tok"] or r["is_blank"]
               for r in steps)


def test_perf_sweep_tiny_smoke(tmp_path):
    """tools/perf_sweep.py code paths under TRT_ASR_SWEEP_TINY (CPU, tiny
    model): (a) bucketed corpus mode measures every batch and records the
    measured-wall methodology; (b) offline --flash-att rows carry the
    flash_active trace verdict so a silent XLA fallback can't masquerade
    as a flash measurement."""
    env = {**os.environ, "PYTHONPATH": REPO, "TRT_ASR_SWEEP_TINY": "1"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/perf_sweep.py"),
         "--bucket-secs", "2,4", "--batches", "2",
         "--out", str(tmp_path / "b1_sweep.json")],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    art = json.load(open(tmp_path / "offline_bucketed.json"))
    row = art["configs"]["bucketed"]
    assert row["bucketed"]["wall_s"] > 0 and row["pad_to_max"]["wall_s"] > 0
    assert "every batch measured" in row["methodology"]

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/perf_sweep.py"),
         "--offline", "2", "--batches", "2", "--flash-att",
         "--out", str(tmp_path / "b1_sweep2.json")],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    art = json.load(open(tmp_path / "offline_sweep2.json"))
    assert art["configs"]["b2_flash"]["flash_active"] is True
