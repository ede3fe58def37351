"""Frontend parity: DFT-matmul log-mel vs an independent numpy rfft oracle.

The oracle below re-derives the reference numerics (rust/features/src/lib.rs)
with np.fft.rfft — a completely different compute path from the production
DFT-as-matmul kernel, so agreement is a real check.
"""

import numpy as np
import pytest

from trt_asr_tpu.frontend import (
    LogMelFrontend,
    StreamingLogMel,
    apply_per_feature_norm,
    compute_per_feature_stats,
    hann_window,
    mel_filterbank,
)


def oracle_logmel(audio: np.ndarray, sr=16000, n_fft=512, win=400, hop=160, n_mels=128):
    window = hann_window(win).astype(np.float64)
    fb = mel_filterbank(n_mels, n_fft, sr, 0.0, sr / 2).astype(np.float64)
    frames = []
    pos = 0
    while pos + win <= len(audio):
        fr = audio[pos : pos + win].astype(np.float64) * window
        spec = np.fft.rfft(fr, n=n_fft)
        power = spec.real**2 + spec.imag**2
        frames.append(np.log(fb @ power + 1e-5))
        pos += hop
    return np.asarray(frames, dtype=np.float32).reshape(-1, n_mels)


@pytest.fixture(scope="module")
def audio(rng_mod=np.random.default_rng(42)):
    t = np.arange(16000 + 357)
    sig = 0.3 * np.sin(2 * np.pi * 440 * t / 16000) + 0.05 * rng_mod.standard_normal(t.shape)
    return sig.astype(np.float32)


def test_shape_stability():
    # Reference unit test: 1 s of 16 kHz audio -> 98 frames x 128 mels
    # (rust/features/src/lib.rs:225-242).
    fe = LogMelFrontend()
    out = np.asarray(fe(np.zeros(16000, np.float32)))
    assert out.shape == (98, 128)
    # silence floors at ln(1e-5)
    np.testing.assert_allclose(out, np.log(1e-5), atol=1e-3)


def test_matches_fft_oracle(audio):
    fe = LogMelFrontend()
    ours = np.asarray(fe(audio))
    ref = oracle_logmel(audio)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_batched(audio):
    fe = LogMelFrontend()
    batch = np.stack([audio[:8000], audio[8000:16000]])
    out = np.asarray(fe(batch))
    single0 = np.asarray(fe(batch[0]))
    assert out.shape[0] == 2
    np.testing.assert_allclose(out[0], single0, atol=5e-4)


def test_streaming_carry_matches_offline(audio):
    fe = LogMelFrontend()
    offline = np.asarray(fe(audio))
    stream = StreamingLogMel(fe)
    chunks = [audio[:1000], audio[1000:5555], audio[5555:9000], audio[9000:]]
    outs = [stream.push(c) for c in chunks]
    got = np.concatenate([o for o in outs if o.size], axis=0)
    assert got.shape == offline.shape
    # same frames, different matmul batch sizes -> reassociation-level diffs
    np.testing.assert_allclose(got, offline, atol=5e-4)


def test_per_feature_norm_matches_reference_semantics(audio):
    fe = LogMelFrontend()
    feats = np.asarray(fe(audio))
    mean, std = compute_per_feature_stats(feats)
    mean, std = np.asarray(mean), np.asarray(std)
    t = feats.shape[0]
    ref_mean = feats.mean(axis=0)
    ref_std = np.sqrt(((feats - ref_mean) ** 2).sum(axis=0) / (t - 1)) + 1e-5
    np.testing.assert_allclose(mean, ref_mean, atol=1e-5)
    np.testing.assert_allclose(std, ref_std, atol=1e-5)
    normed = np.asarray(apply_per_feature_norm(feats, mean, std))
    # near-constant columns (log-floor) have std==eps; exclude them
    active = std > 1e-3
    np.testing.assert_allclose(normed.mean(axis=0)[active], 0.0, atol=1e-4)


def test_pallas_mel_kernel_interpret(audio):
    from jax.experimental.pallas import tpu as pltpu

    fe_ref = LogMelFrontend(use_pallas=False)
    fe_pl = LogMelFrontend(use_pallas=True)
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(fe_pl(audio[:8000]))
    ref = np.asarray(fe_ref(audio[:8000]))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
