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
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_synthetic_e2e.py"),
         "--out-dir", str(tmp_path), "--steps", "300", "--train-utts", "64",
         "--eval-utts", "8", "--gate-wer", "0.10"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-1000:]
    assert "WER GATE PASS" in out.stdout
