"""Taps, snapshots, NaN guard — the deterministic-replay and observability
subsystems (reference N5/N13 + snapshot dumps)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.debug.nan_guard import NanGuardError, check_finite, scrub_logits
from trt_asr_tpu.debug.taps import TapRun
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import StreamingSession

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tap_writer_stats_and_sidecar(tmp_path):
    run = TapRun(str(tmp_path))
    w = run.features(n_mels=4)
    w.write(np.ones((10, 4), np.float32))
    bad = np.ones((5, 4), np.float32)
    bad[0, 0] = np.nan
    w.write(bad, {"ctx": "chunk1"})
    run.close()

    files = os.listdir(run.run_dir)
    assert "features.f32" in files and "features.f32.json" in files
    with open(os.path.join(run.run_dir, "features.f32.json")) as f:
        sc = json.load(f)
    assert sc["frames"] == 15 and sc["bins"] == 4
    assert sc["nan_inf_count"] == 1
    raw = np.fromfile(os.path.join(run.run_dir, "features.f32"), np.float32)
    assert raw.size == 60
    nd = open(os.path.join(run.run_dir, "features.chunks.ndjson")).read().splitlines()
    assert len(nd) == 2
    assert json.loads(nd[1])["ctx"] == "chunk1"


def test_session_taps_and_snapshots(tmp_path):
    model = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    rt = RuntimeConfig(tap_enabled=True, tap_dir=str(tmp_path / "taps"),
                       snapshot_dir=str(tmp_path / "snaps"))
    sess = StreamingSession(model, rt)
    t = np.arange(24000)
    audio = (0.4 * np.sin(2 * np.pi * 300 * t / 16000)).astype(np.float32)
    sess.push_audio(audio)
    sess.finalize()

    run_dirs = os.listdir(tmp_path / "taps")
    assert len(run_dirs) == 1
    files = os.listdir(tmp_path / "taps" / run_dirs[0])
    assert "audio.f32" in files and "features.f32" in files

    snaps = sorted(os.listdir(tmp_path / "snaps"))
    assert len(snaps) >= 2
    with open(tmp_path / "snaps" / snaps[0] / "meta.json") as f:
        meta = json.load(f)
    assert "att_cache_shape" in meta and "y_id" in meta
    att = np.fromfile(tmp_path / "snaps" / snaps[0] / "att_cache.f32", np.float32)
    assert att.size == np.prod(meta["att_cache_shape"])

    # tap replays through the CLI feature-replay path
    feats_path = str(tmp_path / "taps" / run_dirs[0] / "features.f32")
    from trt_asr_tpu.cli import main as cli_main
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        cli_main([feats_path, "--features-input", "--synthetic-model", "tiny"])
    assert "Transcript:" in buf.getvalue()


def test_analyze_tap_tool(tmp_path):
    run = TapRun(str(tmp_path))
    w = run.audio()
    w.write(0.5 * np.sin(np.arange(16000) * 0.1).astype(np.float32))
    run.close()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze_tap.py"), w.path],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "samples=16000" in out.stdout
    assert "nan/inf=0" in out.stdout
    assert "writer gaps: 0" in out.stdout


def test_tap_writer_gap_filling(tmp_path):
    """stream_pos beyond the written count zero-fills the hole (reference
    audio_tap.h gap_frames/gaps_filled) so replay stays time-aligned."""
    run = TapRun(str(tmp_path))
    w = run.audio()
    w.write(np.ones(1000, np.float32), stream_pos=0)
    w.write(np.ones(1000, np.float32), stream_pos=1500)   # 500 lost samples
    run.close()
    raw = np.fromfile(w.path, np.float32)
    assert raw.size == 2500
    assert np.all(raw[1000:1500] == 0.0) and np.all(raw[1500:] == 1.0)
    with open(w.sidecar_path) as f:
        sc = json.load(f)
    assert sc["gap_count"] == 1 and sc["gap_values_filled"] == 500
    assert sc["gaps_filled"] is True
    nd = [json.loads(x) for x in open(w.ndjson_path)]
    assert nd[1]["gap_values_filled"] == 500

    # feature taps count stream_pos in FRAMES
    run2 = TapRun(str(tmp_path / "f"))
    wf = run2.features(n_mels=4)
    wf.write(np.ones((10, 4), np.float32), stream_pos=0)
    wf.write(np.ones((10, 4), np.float32), stream_pos=12)  # 2 lost frames
    run2.close()
    raw = np.fromfile(wf.path, np.float32)
    assert raw.size == 22 * 4
    assert np.all(raw[40:48] == 0.0)


def test_analyze_tap_gaps_plot_compare(tmp_path):
    """The analyzer reports writer gaps + wall-clock arrival gaps, renders
    a PNG when matplotlib exists, and diffs two taps (--compare)."""
    import time

    run = TapRun(str(tmp_path))
    w = run.audio()
    w.write(0.1 * np.ones(1600, np.float32))          # 0.1 s of audio
    time.sleep(0.25)                                   # >1.5x wall gap
    w.write(0.1 * np.ones(1600, np.float32), stream_pos=3200)  # writer gap
    run.close()
    other = str(tmp_path / "other.f32")
    raw = np.fromfile(w.path, np.float32)
    mod = raw.copy()
    mod[100] += 0.5
    mod.tofile(other)
    png = str(tmp_path / "tap.png")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "analyze_tap.py"),
         w.path, "--plot", png, "--compare", other, "--json"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    summary = json.loads(out.stdout)
    assert summary["gaps"]["writer_gap_count"] == 1
    assert summary["gaps"]["writer_gap_values_filled"] == 1600
    wall = summary["gaps"]["wall_gaps"]
    assert len(wall) == 1 and wall[0]["after_chunk"] == 0
    assert summary["compare"]["first_divergence_index"] == 100
    assert summary["compare"]["max_abs_diff"] == pytest.approx(0.5)
    assert os.path.exists(png) and os.path.getsize(png) > 1000


def test_nan_guard():
    assert check_finite(np.ones(10), "x")
    assert not check_finite(np.array([1.0, np.nan]), "x")
    with pytest.raises(NanGuardError):
        check_finite(np.array([np.inf]), "x", halt=True)
    out = scrub_logits(np.array([1.0, np.nan, -np.inf]))
    np.testing.assert_array_equal(out, [1.0, -100.0, -100.0])
    # sampling cadence: after first_n, only every `every` is checked
    for _ in range(12):
        check_finite(np.array([np.nan]), "sampled", sample=True, first_n=2, every=100)


def test_session_tdt_trace_and_toggles(tmp_path):
    """debug_tdt_steps produces an NDJSON trace from the production device
    loop; final_on_push and cache_len_override are live (VERDICT r1 #5)."""
    model = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    trace_path = str(tmp_path / "device_trace.jsonl")
    rt = RuntimeConfig(debug_tdt_steps=True, tdt_trace_path=trace_path,
                       final_on_push=True, suppress_leading_punct=False)
    sess = StreamingSession(model, rt)
    audio = (0.4 * np.sin(np.arange(48000) * 0.15)).astype(np.float32)
    done = 0
    for s in range(0, len(audio), 16000):
        done += sess.push_audio(audio[s : s + 16000])
    assert done > 0
    # final_on_push: a FINAL event per push that processed chunks, pre-finalize
    finals = 0
    while (e := sess.poll_event()) is not None:
        finals += int(e.type == 1)
    assert finals >= 1
    sess.finalize()

    # per-step records exist, schema matches host_decode's
    assert sess.tdt_steps, "no trace records from device loop"
    rec = sess.tdt_steps[0]
    for k in ("time_idx", "u", "y_id", "best_tok", "duration", "advance",
              "is_blank", "blank_dur0_clamped"):
        assert k in rec, k
    n_emitted = sum(1 for r in sess.tdt_steps if not r["is_blank"])
    assert n_emitted == len(sess._tokens)

    # NDJSON written + self-compares clean through the first-divergence tool
    assert os.path.exists(trace_path)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity", "compare_tdt_trace.py"),
         trace_path, trace_path], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "IDENTICAL" in out.stdout

    # cache_len_override forces cache_len before each step
    rt2 = RuntimeConfig(cache_len_override=0)
    sess2 = StreamingSession(model, rt2)
    for s in range(0, len(audio), 16000):
        sess2.push_audio(audio[s : s + 16000])
    sess2.finalize()
    # with the override pinning cache_len to 0 before every chunk, the
    # carried attention context is discarded; state cache_len is what the
    # last chunk produced from a forced 0 input (bounded by chunk out len)
    assert int(np.asarray(sess2._enc_state.cache_len)[0]) <= model.cfg.valid_out_len + 3


def test_profiler_capture(tmp_path):
    """TRT_ASR_PROFILE_DIR: the session records an XPlane/trace capture of
    the first N chunk steps (SURVEY §5 tracing — the reference's
    Nsight-profiling analog)."""
    import numpy as np

    from trt_asr_tpu.config import ModelConfig, RuntimeConfig
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.session import StreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=2)
    rt = RuntimeConfig(profile_dir=str(tmp_path / "prof"), profile_chunks=2)
    sess = StreamingSession(model, rt)
    rng = np.random.default_rng(0)
    sess.push_audio((0.1 * rng.standard_normal(32000)).astype(np.float32))
    sess.finalize()
    import glob

    files = glob.glob(str(tmp_path / "prof" / "**" / "*"), recursive=True)
    assert any(("xplane" in f or "trace" in f) and not os.path.isdir(f)
               for f in files), files


def test_joint_dur_first_load_permutation():
    """PARAKEET_JOINT_DUR_FIRST compat: an export with [durations, tokens]
    joint head order loads via a column permutation and produces logits
    identical to the native layout."""
    import jax.numpy as jnp

    from trt_asr_tpu.models.parakeet import init_params
    from trt_asr_tpu.models.parakeet.joint import joint_single_step
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.tokenizer import Tokenizer, make_synthetic_vocab

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=3)
    nd, ths = cfg.num_duration_bins, cfg.token_head_size
    # build the swapped-layout export: [durations, tokens]
    inv = np.concatenate([np.arange(ths, ths + nd), np.arange(ths)])
    swapped = {**params, "joint": {**params["joint"], "out": {
        "w": np.asarray(params["joint"]["out"]["w"])[:, inv],
        "b": np.asarray(params["joint"]["out"]["b"])[inv]}}}
    tok = Tokenizer(make_synthetic_vocab(cfg.vocab_size), blank_id=cfg.blank_id)
    m = ParakeetTDT(cfg, swapped, tok,
                    runtime=RuntimeConfig(joint_dur_first=True))
    rng = np.random.default_rng(0)
    enc_t = jnp.asarray(rng.standard_normal((2, cfg.d_model)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, cfg.pred_hidden)).astype(np.float32))
    want = np.asarray(joint_single_step(params["joint"], enc_t, g))
    got = np.asarray(joint_single_step(m.params["joint"], enc_t, g))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_blank_scan_summary(capfd):
    """PARAKEET_DEBUG_BLANK_SCAN: per-utterance blank/emit preference
    summary from the production decode trace; transcript unchanged."""
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.session import StreamingSession

    model = ParakeetTDT.random(ModelConfig.tiny(), seed=2)
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(24000)).astype(np.float32)
    sess_a = StreamingSession(model, RuntimeConfig())
    sess_b = StreamingSession(model, RuntimeConfig(debug_blank_scan=True))
    for sess in (sess_a, sess_b):
        sess.push_audio(audio)
        sess.finalize()
    err = capfd.readouterr().err
    assert "blank_scan: steps=" in err and "blank_pref=" in err
    assert sess_b.text == sess_a.text


def test_compare_snapshots_tool(tmp_path):
    """tools/parity/compare_snapshots.py (reference
    tools/onnxruntime/compare_encoder_step0.py role, generalized to all
    chunks): identical runs compare clean; a perturbed run (the
    two-backends-drifting scenario the tool exists for) must surface as
    cache/predictor-state divergence with a first-divergence chunk."""
    model = ParakeetTDT.random(ModelConfig.tiny(), seed=5)
    t = np.arange(32000)
    audio = (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
             + 0.1 * np.sin(2 * np.pi * 1100 * t / 16000)).astype(np.float32)

    def run(name, wav, **rt_kw):
        d = str(tmp_path / name)
        sess = StreamingSession(model, RuntimeConfig(snapshot_dir=d, **rt_kw))
        sess.push_audio(wav)
        sess.finalize()
        return d

    a = run("a", audio)
    b = run("b", audio)
    sab = run("sab", audio * 1.01)

    tool = os.path.join(REPO, "tools", "parity", "compare_snapshots.py")
    same = subprocess.run(
        [sys.executable, tool, a, b, "--summary", str(tmp_path / "s.json")],
        capture_output=True, text=True)
    assert same.returncode == 0, same.stdout + same.stderr
    assert "PASS" in same.stdout
    summary = json.load(open(tmp_path / "s.json"))
    assert summary["pass"] and summary["chunks_compared"] >= 2

    diff = subprocess.run([sys.executable, tool, a, sab],
                          capture_output=True, text=True)
    assert diff.returncode == 1, diff.stdout + diff.stderr
    assert "FAIL" in diff.stdout and "FIRST BAD chunk_" in diff.stdout
