"""WER scorer correctness + manifest round-trip + an end-to-end suite run
over a synthetic dataset (the suite plumbing test the reference ran over
its gate manifest)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from trt_asr_tpu.eval.manifest import (
    make_gate_manifest,
    read_manifest,
    scan_wav_tree,
    write_manifest,
)
from trt_asr_tpu.eval.wer import normalize_text, score_corpus, score_pair

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_normalize():
    assert normalize_text("Hello, world!") == ["HELLO", "WORLD"]
    assert normalize_text("don't stop") == ["DON'T", "STOP"]
    assert normalize_text("'quoted'") == ["QUOTED"]
    assert normalize_text("") == []


def test_score_pair_counts():
    c = score_pair("the cat sat on the mat", "the cat sat on the mat")
    assert c.errors == 0 and c.wer == 0.0 and c.ref_words == 6
    c = score_pair("the cat sat", "the bat sat")
    assert (c.substitutions, c.insertions, c.deletions) == (1, 0, 0)
    c = score_pair("the cat sat", "the cat")
    assert (c.substitutions, c.insertions, c.deletions) == (0, 0, 1)
    c = score_pair("the cat", "the big cat")
    assert (c.substitutions, c.insertions, c.deletions) == (0, 1, 0)
    c = score_pair("a b c", "")
    assert c.deletions == 3 and c.wer == 1.0
    c = score_pair("", "x y")
    assert c.insertions == 2


def test_score_corpus_aggregation():
    res = score_corpus([("a b", "a b"), ("c d", ""), ("e", "e f")])
    assert res["ref_words"] == 5
    assert res["deletions"] == 2 and res["insertions"] == 1
    assert res["empty_hypotheses"] == 1
    assert abs(res["wer"] - 3 / 5) < 1e-9


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """Synthetic wav tree with .txt transcripts + a trans.txt index."""
    from trt_asr_tpu.io.wav import save_wav

    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    refs = ["hello world", "testing one two three", "the quick brown fox"]
    (root / "spk1").mkdir()
    for i, ref in enumerate(refs[:2]):
        t = np.arange(16000 + 8000 * i)
        a = (0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t / 16000)
             + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
        save_wav(str(root / "spk1" / f"utt{i}.wav"), a)
        (root / "spk1" / f"utt{i}.txt").write_text(ref)
    # third utt via trans.txt index
    a = (0.3 * np.sin(2 * np.pi * 330 * np.arange(20000) / 16000)).astype(np.float32)
    save_wav(str(root / "spk1" / "utt2.wav"), a)
    (root / "spk1" / "spk1.trans.txt").write_text("utt2 " + refs[2] + "\n")
    return root, refs


def test_manifest_roundtrip(dataset, tmp_path):
    root, refs = dataset
    entries = scan_wav_tree(str(root))
    assert len(entries) == 3
    assert sorted(e.transcript for e in entries) == sorted(refs)
    p = tmp_path / "m.tsv"
    write_manifest(str(p), entries)
    back = read_manifest(str(p))
    assert [e.transcript for e in back] == [e.transcript for e in entries]
    assert all(e.duration_sec > 0 for e in back)


def test_gate_manifest_sha_verification(dataset, tmp_path):
    root, _ = dataset
    entries = scan_wav_tree(str(root))
    gate = tmp_path / "gate.tsv"
    picked = make_gate_manifest(entries, str(gate), per_bucket=2)
    assert len(picked) == 2
    ok = read_manifest(str(gate), verify_sha=True)
    assert len(ok) == 2
    # tamper -> gate fails
    with open(picked[0].audio_path, "r+b") as f:
        f.seek(100)
        f.write(b"\x99\x99")
    with pytest.raises(ValueError, match="sha mismatch"):
        read_manifest(str(gate), verify_sha=True)


def test_run_suite_end_to_end(dataset, tmp_path):
    """Full suite over the synthetic set with a tiny random model: plumbing,
    variant matrix, latency capture, results JSON, scorer CLI."""
    root, _ = dataset
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite

    entries = scan_wav_tree(str(root))
    man = tmp_path / "m.tsv"
    write_manifest(str(man), entries[:2])

    cfg = SuiteConfig(manifest_path=str(man), out_dir=str(tmp_path / "out"),
                      engine="python", synthetic_model="tiny",
                      variants=["base", "nocache"], rounds=1, stream_sim=0.5)
    res = run_suite(cfg)
    assert set(res["variants"]) == {"base", "nocache"}
    base = res["variants"]["base"][0]
    assert base["wer"]["num_utterances"] == 2
    assert base["latency_ms"] is not None and base["latency_ms"]["p50"] >= 0
    assert base["rtfx"] is not None
    assert os.path.exists(tmp_path / "out" / "suite_results.json")

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "stt_suite", "score_wer.py"),
         "--results", str(tmp_path / "out" / "suite_results.json")],
        capture_output=True, text=True)
    assert out.returncode == 0
    assert "WER=" in out.stdout


def test_run_suite_batch_engine_surface(dataset, tmp_path):
    """engine='batch' (lockstep BatchStreamingEngine slots, staggered
    attach/finalize, B=2 over 3 utterances) must transcribe each utterance
    exactly as a dedicated single-slot engine does — concurrent staggered
    serving may not leak across slots (VERDICT r2 #6: the suite must face
    the real serving surface)."""
    root, _ = dataset
    from trt_asr_tpu.config import ModelConfig, RuntimeConfig
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite
    from trt_asr_tpu.io.wav import load_wav
    from trt_asr_tpu.models.parakeet.model import ParakeetTDT
    from trt_asr_tpu.streaming.batch_engine import BatchStreamingEngine

    entries = scan_wav_tree(str(root))
    man = tmp_path / "m.tsv"
    write_manifest(str(man), entries[:3])

    res_b = run_suite(SuiteConfig(
        manifest_path=str(man), out_dir=str(tmp_path / "ob"),
        engine="batch", batch_size=2, synthetic_model="tiny",
        variants=["base"], rounds=1, stream_sim=0.5, feature_norm="none"))
    got = [u["transcript"]
           for u in res_b["variants"]["base"][0]["utterances"]]

    model = ParakeetTDT.random(ModelConfig.tiny())  # same seed as run_suite
    want = []
    for e in read_manifest(str(man)):
        eng = BatchStreamingEngine(model, batch_size=1,
                                   runtime=RuntimeConfig.from_env())
        sid = eng.open_stream()
        eng.push_audio(sid, load_wav(e.audio_path))
        eng.finalize_stream(sid)
        eng.run_until_drained()
        want.append(eng.text(sid))
    assert got == want
    assert res_b["variants"]["base"][0]["wer"]["num_utterances"] == 3

    with pytest.raises(ValueError, match="feature_norm"):
        run_suite(SuiteConfig(out_dir=str(tmp_path / "oe"), engine="batch",
                              manifest_path=str(man), synthetic_model="tiny",
                              feature_norm="per_feature"))


def test_run_suite_beam_engine(dataset, tmp_path):
    """beam=1 through the suite must reproduce the greedy python engine's
    transcripts (the streaming beam anchor at the eval surface); beam>1
    runs and records the width in the results config; unsupported engine
    combos are rejected."""
    root, _ = dataset
    from trt_asr_tpu.eval.suite import SuiteConfig, run_suite

    entries = scan_wav_tree(str(root))
    man = tmp_path / "m.tsv"
    write_manifest(str(man), entries[:2])
    common = dict(manifest_path=str(man), synthetic_model="tiny",
                  variants=["base"], rounds=1, stream_sim=0.5)

    res_g = run_suite(SuiteConfig(out_dir=str(tmp_path / "og"),
                                  engine="python", **common))
    res_b1 = run_suite(SuiteConfig(out_dir=str(tmp_path / "o1"),
                                   engine="python", beam=1, **common))
    tg = [u["transcript"] for u in res_g["variants"]["base"][0]["utterances"]]
    t1 = [u["transcript"] for u in res_b1["variants"]["base"][0]["utterances"]]
    assert t1 == tg
    assert res_b1["config"]["beam"] == 1

    res_b2 = run_suite(SuiteConfig(out_dir=str(tmp_path / "o2"),
                                   engine="python", beam=2, **common))
    assert res_b2["variants"]["base"][0]["wer"]["num_utterances"] == 2

    with pytest.raises(ValueError, match="beam"):
        run_suite(SuiteConfig(out_dir=str(tmp_path / "oe"), engine="batch",
                              beam=2, feature_norm="none", **common))
