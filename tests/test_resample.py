"""Resampler (io/resample.py): tone fidelity across common rate pairs,
length/DC invariants, alias suppression, and the CLI's auto-resample of
non-16k WAVs producing the same transcript as native 16k audio."""

import numpy as np
import pytest

from trt_asr_tpu.io.resample import load_audio, resample


def _tone(sr, f, dur=1.0, amp=0.5):
    t = np.arange(int(sr * dur))
    return (amp * np.sin(2 * np.pi * f * t / sr)).astype(np.float32)


@pytest.mark.parametrize("sr_in", [8000, 22050, 44100, 48000])
def test_tone_fidelity(sr_in):
    """A 440 Hz tone resampled to 16 kHz matches the natively generated
    16 kHz tone to <2% peak error away from the edges."""
    y = resample(_tone(sr_in, 440.0), sr_in, 16000)
    ref = _tone(16000, 440.0)
    n = min(len(y), len(ref))
    assert abs(len(y) - len(ref)) <= 1
    err = np.abs(y[400 : n - 400] - ref[400 : n - 400]).max()
    assert err < 0.02, (sr_in, err)


def test_length_dc_and_identity():
    x = np.full(48000, 0.25, np.float32)
    y = resample(x, 48000, 16000)
    assert len(y) == 16000
    # DC preserved exactly away from the edges (row-normalized weights)
    assert np.abs(y[100:-100] - 0.25).max() < 1e-5
    # same-rate input passes through untouched
    assert resample(x, 16000, 16000) is x or np.array_equal(
        resample(x, 16000, 16000), x)
    assert resample(np.zeros(0, np.float32), 48000, 16000).size == 0


def test_alias_suppression():
    """A 10 kHz tone at 48 kHz lies above the 16 kHz Nyquist: after
    downsampling it must be attenuated to noise, not folded to 6 kHz."""
    y = resample(_tone(48000, 10000.0), 48000, 16000)
    # power relative to a passband tone of the same input amplitude
    ref = resample(_tone(48000, 440.0), 48000, 16000)
    p_alias = float(np.mean(y[400:-400] ** 2))
    p_pass = float(np.mean(ref[400:-400] ** 2))
    assert p_alias < p_pass * 1e-3, (p_alias, p_pass)  # >30 dB down


def test_cli_auto_resample(tmp_path):
    """A 48 kHz WAV is accepted and auto-resampled (the reference CLI
    hard-rejects it): the audio reaching the model matches the 16 kHz
    original to filter precision, and the CLI transcribes it."""
    import io
    from contextlib import redirect_stdout

    from trt_asr_tpu.cli import main as cli_main
    from trt_asr_tpu.io.wav import save_wav

    dur = 2.0
    # band-limited multi-tone content (all well below the 0.95-Nyquist
    # transition band, which full-band noise would straddle twice)
    a16 = (_tone(16000, 300.0, dur, 0.4) + _tone(16000, 1500.0, dur, 0.2)
           + _tone(16000, 4000.0, dur, 0.1)).astype(np.float32)
    a48 = resample(a16, 16000, 48000)
    w48 = tmp_path / "a48.wav"
    save_wav(str(w48), a48, rate=48000)

    back = load_audio(str(w48))
    n = min(len(back), len(a16))
    # int16 WAV quantization + two filter passes: a few % peak error
    assert np.abs(back[400 : n - 400] - a16[400 : n - 400]).max() < 0.05

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli_main([str(w48), "--synthetic-model", "tiny",
                       "--feature-norm", "none"])
    assert rc == 0
    assert any(l.startswith("Transcript: ")
               for l in buf.getvalue().splitlines())


def test_load_audio_rates(tmp_path):
    from trt_asr_tpu.io.wav import save_wav

    p = tmp_path / "t.wav"
    save_wav(str(p), _tone(44100, 500.0), rate=44100)
    y = load_audio(str(p))
    assert abs(len(y) - 16000) <= 1
