"""Log-mel feature frontend, TPU-native.

Numerics contract (must match the reference's Rust frontend,
rust/features/src/lib.rs:27-223 in gracee3/trt-asr-engine):

- 16 kHz mono f32 audio, n_fft=512, win=400 (symmetric Hann), hop=160
- no pre-emphasis, no dither at inference
- frames: ``while pos + win <= len`` — no padding, boundary samples dropped
- power spectrum |rfft|^2 over 257 bins
- triangular HTK-mel filterbank, 128 mels over [0, 8 kHz], built on the
  open/closed interval conventions of the reference (left-exclusive rising
  edge, center-inclusive falling edge)
- log(energy + 1e-5)

TPU-first design: instead of an FFT (poorly suited to the MXU and to tiny
512-point batches), the DFT is expressed as two real matmuls with the Hann
window folded into the DFT basis:

    frames[T, 400] @ (hann * cos)[400, 257] -> re
    frames[T, 400] @ (hann * sin)[400, 257] -> im
    power = re^2 + im^2;  mel = power @ melW.T;  out = log(mel + 1e-5)

That is ~2*T*400*257 + 2*T*257*128 FLOPs of pure MXU work with one fused
elementwise stage — XLA fuses square/add/log into the matmul epilogues. A
Pallas fused variant lives in ops/pallas/mel_kernel.py.

``StreamingLogMel`` additionally carries the (win - hop) overlap samples
across chunk pushes so streaming features are bit-identical to offline ones
(the reference CLI recomputed features per chunk and dropped boundary
samples — rust/cli/src/main.rs:416-483 — a known wart we fix).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.contract import FrontendSpec


def hann_window(size: int) -> np.ndarray:
    """Symmetric Hann window: 0.5*(1 - cos(2*pi*i/(N-1)))."""
    i = np.arange(size, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / (size - 1)))).astype(np.float32)


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: float, f_min: float = 0.0, f_max: Optional[float] = None
) -> np.ndarray:
    """Triangular HTK-mel filterbank, [n_mels, n_fft//2+1].

    Edge conventions follow the reference frontend exactly: rising edge on
    (left, center) exclusive, falling edge on [center, right) left-inclusive,
    bin frequency = i * sr / n_fft. No area normalization.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    min_mel = _hz_to_mel(np.asarray(f_min, dtype=np.float64))
    max_mel = _hz_to_mel(np.asarray(f_max, dtype=np.float64))
    mel_points = _mel_to_hz(min_mel + (max_mel - min_mel) * np.arange(n_mels + 2) / (n_mels + 1))

    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins, dtype=np.float64) * sample_rate / n_fft
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = mel_points[m], mel_points[m + 1], mel_points[m + 2]
        rising = (freqs > left) & (freqs < center)
        falling = (freqs >= center) & (freqs < right)
        fb[m, rising] = (freqs[rising] - left) / (center - left)
        fb[m, falling] = (right - freqs[falling]) / (right - center)
    return fb.astype(np.float32)


def _dft_basis(win_length: int, n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis restricted to the first win_length samples.

    Zero-padding to n_fft is implicit: rows beyond win_length contribute
    nothing, so the basis only needs [win_length, n_bins].
    """
    n_bins = n_fft // 2 + 1
    n = np.arange(win_length, dtype=np.float64)[:, None]      # sample index
    k = np.arange(n_bins, dtype=np.float64)[None, :]           # bin index
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


class LogMelFrontend:
    """Stateless log-mel extractor. Call with a 1-D or [B, S] audio array."""

    def __init__(self, spec: Optional[FrontendSpec] = None, use_pallas: bool = False):
        self.spec = spec or FrontendSpec()
        s = self.spec
        window = hann_window(s.win_length)
        cos_b, sin_b = _dft_basis(s.win_length, s.n_fft)
        # Fold the window into the DFT basis: one matmul does window+DFT.
        self._wcos = jnp.asarray(window[:, None] * cos_b)     # [win, bins]
        self._wsin = jnp.asarray(window[:, None] * sin_b)     # [win, bins]
        self._mel = jnp.asarray(mel_filterbank(s.n_mels, s.n_fft, s.sample_rate_hz,
                                               s.mel_fmin_hz, s.mel_fmax_hz).T)  # [bins, mels]
        self.use_pallas = use_pallas

    def num_frames(self, num_samples: int) -> int:
        s = self.spec
        if num_samples < s.win_length:
            return 0
        return (num_samples - s.win_length) // s.hop_length + 1

    def _frame(self, audio: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        s = self.spec
        idx = np.arange(n_frames)[:, None] * s.hop_length + np.arange(s.win_length)[None, :]
        return audio[..., idx]  # [..., T, win]

    @functools.partial(jax.jit, static_argnums=0)
    def _compute_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        if self.use_pallas:
            from trt_asr_tpu.ops.pallas.mel_kernel import logmel_from_frames_pallas
            return logmel_from_frames_pallas(frames, self._wcos, self._wsin, self._mel, s.log_floor)
        re = jnp.dot(frames, self._wcos, preferred_element_type=jnp.float32)
        im = jnp.dot(frames, self._wsin, preferred_element_type=jnp.float32)
        power = re * re + im * im
        mel = jnp.dot(power, self._mel, preferred_element_type=jnp.float32)
        return jnp.log(mel + s.log_floor)

    def __call__(self, audio) -> jnp.ndarray:
        """audio [S] or [B, S] f32 -> log-mel [T, n_mels] or [B, T, n_mels]."""
        audio = jnp.asarray(audio, dtype=jnp.float32)
        n_frames = self.num_frames(audio.shape[-1])
        if n_frames == 0:
            return jnp.zeros(audio.shape[:-1] + (0, self.spec.n_mels), jnp.float32)
        return self._compute_frames(self._frame(audio, n_frames))


class StreamingLogMel:
    """Stateful frontend: carries frame overlap across pushes.

    Guarantee: concatenating the outputs of successive ``push`` calls covers
    exactly the same frames as running :class:`LogMelFrontend` on the
    concatenated audio (no boundary samples dropped), matching it to matmul
    reassociation tolerance. Carry size is (win - hop) plus the remainder
    that doesn't fill a hop.
    """

    def __init__(self, frontend: Optional[LogMelFrontend] = None):
        self.frontend = frontend or LogMelFrontend()
        self._carry = np.zeros((0,), dtype=np.float32)

    def reset(self) -> None:
        self._carry = np.zeros((0,), dtype=np.float32)

    def push(self, audio: np.ndarray) -> np.ndarray:
        s = self.frontend.spec
        buf = np.concatenate([self._carry, np.asarray(audio, dtype=np.float32)])
        n_frames = self.frontend.num_frames(buf.shape[0])
        if n_frames == 0:
            self._carry = buf
            return np.zeros((0, s.n_mels), dtype=np.float32)
        consumed = n_frames * s.hop_length
        self._carry = buf[consumed:]
        return np.asarray(self.frontend(buf[: consumed + (s.win_length - s.hop_length)]))
