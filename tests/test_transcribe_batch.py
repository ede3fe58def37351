"""Batched offline transcription (ParakeetTDT.transcribe_batch): rows are
token-exact with per-utterance transcribe_offline, across mixed lengths,
forced multi-window encoding, dp/tp mesh sharding, and degenerate inputs.
The reference has no batch surface at all (B=1 everywhere, SURVEY §2.5)."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def model():
    return ParakeetTDT.random(ModelConfig.tiny(), seed=5)


def _audios():
    rng = np.random.default_rng(4)
    out = []
    for i, n in enumerate((16000, 24000, 30000)):
        t = np.arange(n)
        out.append((0.4 * np.sin(2 * np.pi * (260 + 60 * i) * t / 16000)
                    + 0.1 * rng.standard_normal(n)).astype(np.float32))
    return out


def test_matches_per_utterance_offline(model):
    audios = _audios()
    want = [model.transcribe_offline(a) for a in audios]
    assert any(ids for _, ids in want), "degenerate: nothing emitted"
    got = model.transcribe_batch(audios)
    assert got == want


def test_multi_window_carry(model):
    """Tiny max_frames forces several encode+decode windows per row; the
    carried batched decode state must keep rows token-exact with the
    single-window result AND with transcribe_offline at the same window
    size."""
    audios = _audios()
    got = model.transcribe_batch(audios, max_frames=64, pad_multiple=32)
    want = [model.transcribe_offline(a, max_frames=64) for a in audios]
    assert got == want


def test_mesh_sharded_matches_unsharded(model):
    """dp x tp offline batch == unsharded, token for token (b=3 padded to
    the dp multiple with zero-length rows)."""
    audios = _audios()
    want = model.transcribe_batch(audios)
    mesh = make_mesh(dp=4, tp=2)
    got = model.transcribe_batch(audios, mesh=mesh)
    assert got == want
    # param placement is cached per mesh
    got2 = model.transcribe_batch(audios, mesh=mesh)
    assert got2 == want


def test_degenerate_inputs(model):
    assert model.transcribe_batch([]) == []
    out = model.transcribe_batch([np.zeros(0, np.float32),
                                  _audios()[0]])
    assert out[0] == ("", [])
    assert out[1] == model.transcribe_offline(_audios()[0])
