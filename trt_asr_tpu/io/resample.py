"""Sample-rate conversion (dependency-free, host-side).

Beyond-reference capability: the reference CLI rejects anything but
16 kHz mono (rust/cli/src/main.rs:341-372) and so does this repo's
strict ``load_wav`` — but real-world audio arrives at 8/22.05/44.1/48
kHz. ``resample`` is a windowed-sinc interpolator (Hann window, 16 zero
crossings, cutoff at 95% of the narrower Nyquist, per-row weight
normalization for exact DC) that handles arbitrary rational and
irrational ratios in one code path; ``load_audio`` wraps ``load_wav``
with automatic conversion to the model's 16 kHz.

This is deliberately host-side numpy: audio IO is not the hot path, and
keeping it out of jit means no shape specialization per input length.
Accuracy: >60 dB alias suppression for the common down-ratios; a pure
tone round-trips 48k->16k with <2% peak error against a natively
generated 16 kHz tone (tests)."""

from __future__ import annotations

import numpy as np

_ZEROS = 16          # sinc zero crossings kept per side
_BLOCK = 1 << 16     # output samples per vectorized block


def resample(x: np.ndarray, sr_in: int, sr_out: int = 16000) -> np.ndarray:
    """x [N] f32 at sr_in -> [round(N*sr_out/sr_in)] f32 at sr_out."""
    x = np.asarray(x, np.float32)
    if sr_in == sr_out or x.size == 0:
        return x
    ratio = sr_out / sr_in
    cutoff = min(1.0, ratio) * 0.95          # of the input Nyquist
    hw = int(np.ceil(_ZEROS / cutoff))       # kernel half-width, input samples
    n_out = int(round(x.size * ratio))
    xpad = np.pad(x, (hw, hw + 1))
    offs = np.arange(-hw + 1, hw + 1)        # [K] taps around floor(t)
    y = np.empty(n_out, np.float32)
    for b0 in range(0, n_out, _BLOCK):
        b1 = min(b0 + _BLOCK, n_out)
        t = np.arange(b0, b1) * (sr_in / sr_out)     # input-time per output
        base = np.floor(t).astype(np.int64)
        frac = t[:, None] - (base[:, None] + offs[None, :])   # [B, K]
        w = cutoff * np.sinc(cutoff * frac)
        w *= 0.5 * (1.0 + np.cos(np.pi * np.clip(frac / hw, -1.0, 1.0)))
        w /= np.sum(w, axis=1, keepdims=True)        # exact DC gain
        y[b0:b1] = np.sum(xpad[base[:, None] + offs[None, :] + hw] * w,
                          axis=1)
    return y


def load_audio(path: str, target_rate: int = 16000) -> np.ndarray:
    """load_wav + automatic resampling to the model rate. Use where
    convenience beats reference-strictness (the CLIs); harnesses that
    must fail loudly on rate mismatches keep calling load_wav."""
    from trt_asr_tpu.io.wav import load_wav

    import wave

    with wave.open(path, "rb") as w:
        rate = w.getframerate()
    audio = load_wav(path, expect_rate=rate)
    return resample(audio, rate, target_rate)
