"""Subtitle export (SRT / WebVTT) from frame-anchored word timestamps.

Beyond-reference capability: the reference emits text-only events; this
repo's decode surfaces produce word-level [start_s, end_s] intervals
(decode/timestamps.py), which map directly onto subtitle cues. Cues are
built by greedy word packing: a cue closes when it would exceed
``max_chars``, ``max_dur_s``, or a silence gap of ``gap_s`` opens between
consecutive words (natural phrase boundaries — with continuous-mode
segments the segment boundaries dominate).

Inputs are the framework's own schemas:
- words: [{word, start_s, end_s}, ...] (session.word_timestamps())
- segments: [{text, words, start_s, ...}, ...] (ContinuousTranscriber /
  daemon segment events) — each segment's words are relative to the
  segment, so ``offset_s=segment.start_s`` re-anchors them.
"""

from __future__ import annotations

from typing import List, Optional


def _fmt_ts(t: float, sep: str) -> str:
    ms = int(round(t * 1000))
    h, rem = divmod(ms, 3600_000)
    m, rem = divmod(rem, 60_000)
    s, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d}{sep}{ms:03d}"


def pack_cues(words: List[dict], *, max_chars: int = 42,
              max_dur_s: float = 5.0, gap_s: float = 0.8,
              offset_s: float = 0.0) -> List[dict]:
    """Greedy word->cue packing; returns [{start_s, end_s, text}]."""
    cues: List[dict] = []
    cur: Optional[dict] = None
    for w in words:
        ws, we = w["start_s"] + offset_s, w["end_s"] + offset_s
        if cur is not None:
            new_text = f"{cur['text']} {w['word']}"
            if (len(new_text) > max_chars
                    or we - cur["start_s"] > max_dur_s
                    or ws - cur["end_s"] > gap_s):
                cues.append(cur)
                cur = None
        if cur is None:
            cur = {"start_s": ws, "end_s": we, "text": w["word"]}
        else:
            cur["text"] = new_text
            cur["end_s"] = we
    if cur is not None:
        cues.append(cur)
    return cues


def cues_from_segments(segments: List[dict], **kw) -> List[dict]:
    """Continuous-mode segments -> cues (per-segment packing; words are
    re-anchored to absolute stream time via each segment's start_s)."""
    cues: List[dict] = []
    for seg in segments:
        cues.extend(pack_cues(seg.get("words", []),
                              offset_s=seg["start_s"], **kw))
    return cues


def format_srt(cues: List[dict]) -> str:
    out = []
    for i, c in enumerate(cues, 1):
        out.append(f"{i}\n{_fmt_ts(c['start_s'], ',')} --> "
                   f"{_fmt_ts(c['end_s'], ',')}\n{c['text']}\n")
    return "\n".join(out)


def format_vtt(cues: List[dict]) -> str:
    out = ["WEBVTT\n"]
    for c in cues:
        out.append(f"{_fmt_ts(c['start_s'], '.')} --> "
                   f"{_fmt_ts(c['end_s'], '.')}\n{c['text']}\n")
    return "\n".join(out)
