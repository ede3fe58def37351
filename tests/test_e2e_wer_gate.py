"""End-to-end WER gate (slow): train on synthetic spoken words, transcribe
HELD-OUT utterances through the real suite, require near-zero WER.

This is the gate the reference never passed (VALIDATION_REPORT_WER: 100% /
98.23% WER, mostly-empty transcripts). Run with:

    python -m pytest tests/test_e2e_wer_gate.py -m slow --override-ini addopts=
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_synthetic_e2e_wer_gate(tmp_path):
    """Hardened gate (VERDICT r2 #6): 1120-word vocabulary, 8-12-word
    utterances (>=5 s — many steady chunks, att-cache saturation), 50
    held-out utterances, served through the python session AND the
    lockstep batch engine (staggered attach/finalize), additive-noise
    condition, granularity sweep, 4-variant matrix — then the sensitivity
    proof on EVERY surface: the SAME model must FAIL under the
    drop_time_carry fault injection. (The native-CLI surface runs in the
    r3 artifact, artifacts/e2e_wer_gate_r3.json — per-utterance subprocess
    compiles make it a tool-level run, not a pytest-budget one.)

    --streaming-train is load-bearing at this utterance length: offline
    full-context training decodes at 84% WER through the streaming
    surfaces (limited-context attention diverges word by word); training
    through the serving chunk schedule fixes it (round-3 root cause)."""
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    tool = os.path.join(REPO, "tools", "train_synthetic_e2e.py")
    out = subprocess.run(
        [sys.executable, tool,
         "--out-dir", str(tmp_path), "--steps", "2500", "--train-utts", "4000",
         "--weight-decay", "1e-4", "--streaming-train",
         "--eval-utts", "50", "--vocab-size", "1120", "--gate-wer", "0.05",
         "--words-per-utt", "8,13", "--joint-hidden", "64",
         "--surfaces", "python,batch",
         "--stream-sims", "0.3,0.5,1.0"],
        capture_output=True, text=True, env=env, timeout=14000)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-1000:]
    assert "WER GATE PASS" in out.stdout

    sab = subprocess.run(
        [sys.executable, tool,
         "--out-dir", str(tmp_path), "--skip-train", "--vocab-size", "1120",
         "--eval-utts", "50", "--gate-wer", "0.05", "--stream-sims", "0.5",
         "--words-per-utt", "8,13", "--surfaces", "python,batch",
         "--variants", "base", "--noise-snr-db", "0",
         "--sabotage", "drop_time_carry"],
        capture_output=True, text=True, env=env, timeout=7200)
    assert sab.returncode != 0 and "WER GATE FAIL" in sab.stdout, (
        "the gate must demonstrably fail under a decode-semantics fault:\n"
        + sab.stdout[-2000:])
