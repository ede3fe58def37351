"""Seeded smoke of the randomized property fuzz (tools/fuzz_session.py):
every runtime surface must be token-exact with the canonical single-push
session under random utterance lengths / push plans / interruption points.
The long sweep runs via the tool (artifacts/fuzz_session.json); this pins
the harness itself green in CI."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=7)


@pytest.mark.parametrize("seed", [11, 12])
def test_fuzz_seed_all_surfaces(model, seed):
    from tools.fuzz_session import run_seed

    r = run_seed(model, seed, ["shreds", "snapshot", "engine", "beam1"])
    assert r["fails"] == {}, r
    assert r["tokens"] > 0  # the audio generator must exercise emissions


def test_fuzz_detects_divergence(model, monkeypatch):
    """Sensitivity: the harness must FAIL when a surface diverges — force
    the known time-carry sabotage on the shredded session path."""
    import tools.fuzz_session as fz
    from trt_asr_tpu.streaming.session import StreamingSession

    real_init = StreamingSession.__init__
    calls = {"n": 0}

    def patched(self, *a, **kw):
        real_init(self, *a, **kw)
        calls["n"] += 1
        if calls["n"] > 1:  # leave the canonical session clean
            self.rt = type(self.rt)(**{**self.rt.__dict__,
                                       "sabotage": "drop_time_carry"})

    monkeypatch.setattr(StreamingSession, "__init__", patched)
    # scan seeds until one actually carries a duration overshoot across a
    # chunk boundary (not every random utterance does)
    for seed in range(20, 40):
        r = fz.run_seed(model, seed, ["shreds"])
        if r["fails"]:
            return
    pytest.fail("sabotaged surface never diverged over 20 seeds")
