"""Subtitle export (io/subtitles.py): cue packing rules (chars/duration/
gap), timestamp formatting, segment re-anchoring, and the CLI --srt/--vtt
flags end-to-end (single-utterance and continuous)."""

import numpy as np

from trt_asr_tpu.io.subtitles import (
    cues_from_segments,
    format_srt,
    format_vtt,
    pack_cues,
)


def _w(word, a, b):
    return {"word": word, "start_s": a, "end_s": b}


def test_pack_rules():
    # gap splits
    cues = pack_cues([_w("a", 0.0, 0.2), _w("b", 0.3, 0.5),
                      _w("c", 2.0, 2.2)], gap_s=0.8)
    assert [c["text"] for c in cues] == ["a b", "c"]
    assert cues[0]["start_s"] == 0.0 and cues[0]["end_s"] == 0.5
    # char limit splits
    cues = pack_cues([_w("aaaa", 0, 1), _w("bbbb", 1, 2), _w("cccc", 2, 3)],
                     max_chars=9)
    assert [c["text"] for c in cues] == ["aaaa bbbb", "cccc"]
    # duration limit splits (a+b span 4s <= 5; adding c would span 6s)
    cues = pack_cues([_w("a", 0, 2), _w("b", 2, 4), _w("c", 4, 6)],
                     max_dur_s=5.0)
    assert [c["text"] for c in cues] == ["a b", "c"]
    assert pack_cues([]) == []


def test_formats():
    cues = [{"start_s": 0.0, "end_s": 1.5, "text": "hello world"},
            {"start_s": 3661.25, "end_s": 3662.0, "text": "later"}]
    srt = format_srt(cues)
    assert "1\n00:00:00,000 --> 00:00:01,500\nhello world\n" in srt
    assert "2\n01:01:01,250 --> 01:01:02,000\nlater\n" in srt
    vtt = format_vtt(cues)
    assert vtt.startswith("WEBVTT\n")
    assert "00:00:00.000 --> 00:00:01.500\nhello world\n" in vtt


def test_segment_reanchoring():
    segs = [{"start_s": 10.0, "words": [_w("x", 0.5, 0.9)]},
            {"start_s": 20.0, "words": [_w("y", 0.1, 0.4)]}]
    cues = cues_from_segments(segs)
    assert cues[0]["start_s"] == 10.5 and cues[1]["start_s"] == 20.1


def test_cli_srt_vtt(tmp_path):
    import io
    from contextlib import redirect_stdout

    from trt_asr_tpu.cli import main as cli_main

    rng = np.random.default_rng(0)
    t = np.arange(32000)
    audio = (0.4 * np.sin(2 * np.pi * 300 * t / 16000)
             + 0.1 * rng.standard_normal(32000)).astype("<f4")
    pcm = tmp_path / "a.f32"
    audio.tofile(pcm)
    srt, vtt = tmp_path / "o.srt", tmp_path / "o.vtt"
    with redirect_stdout(io.StringIO()):
        rc = cli_main([str(pcm), "--raw-pcm", "--synthetic-model", "tiny",
                       "--feature-norm", "none",
                       "--srt", str(srt), "--vtt", str(vtt)])
    assert rc == 0
    s = srt.read_text()
    assert "-->" in s and s.strip()
    assert vtt.read_text().startswith("WEBVTT")

    # continuous mode writes absolute-time cues
    z = np.zeros(16000, np.float32)
    sp = (0.4 * np.sin(2 * np.pi * 300 * np.arange(12800) / 16000)
          + 0.1 * rng.standard_normal(12800)).astype(np.float32)
    np.concatenate([z, sp, z]).astype("<f4").tofile(pcm)
    srt2 = tmp_path / "c.srt"
    with redirect_stdout(io.StringIO()):
        rc = cli_main([str(pcm), "--raw-pcm", "--synthetic-model", "tiny",
                       "--continuous", "--srt", str(srt2)])
    assert rc == 0
    body = srt2.read_text()
    assert "-->" in body
    # first cue starts at/after the speech onset region (~0.8-1.1s),
    # i.e. absolute stream time, not segment-relative ~0
    first_ts = body.splitlines()[1].split(" --> ")[0]
    h, m, rest = first_ts.split(":")
    sec = int(h) * 3600 + int(m) * 60 + float(rest.replace(",", "."))
    assert sec >= 0.7
