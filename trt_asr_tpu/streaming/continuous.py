"""Continuous transcription: energy endpointing over an endless stream.

Beyond-reference capability. The reference (and this repo's sessions)
transcribe ONE utterance per finalize/reset cycle; a live microphone or
call feed has no such boundaries. ``ContinuousTranscriber`` wraps any
session (greedy or beam) with an energy-hysteresis endpointer: it detects
speech onset (with pre-roll so the first phones are not clipped), streams
hops into the session while speech lasts, and on a sustained-silence
endpoint finalizes the segment, records it with absolute stream times,
resets the session, and keeps listening — an unbounded stream becomes a
list of utterance segments, each decoded by the exact single-utterance
machinery (segments are token-exact with a dedicated session fed the same
samples — tested, both decoders).

Endpointing is deliberately simple and fully deterministic: per-hop RMS
against an absolute threshold with onset/offset run-length hysteresis.
It runs on the host over 10 ms hops (160 samples at 16 kHz) — no model in
the loop, so it adds nothing to the device path. Anything smarter (a VAD
model) can be dropped in via ``is_speech_fn``.

Semantics that make it composable with the session invariants:
- the session only ever sees the samples between segment start (including
  ``preroll_s`` of leading context) and the endpoint — so per-segment
  transcripts inherit push-granularity invariance from the session;
- ``feature_norm="per_feature"`` needs full-utterance stats and is
  therefore not supported here (contract:
  normalize_requires_full_utterance) — same restriction as the batch
  engine's raw-audio slots.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional

import numpy as np

from trt_asr_tpu.streaming.session import StreamingSession

HOP = 160          # 10 ms at 16 kHz — the mel hop, a natural VAD frame


class ContinuousTranscriber:
    def __init__(self, session: StreamingSession, *,
                 energy_threshold: float = 0.01,   # RMS, full-scale f32
                 silence_s: float = 0.6,           # endpoint after this much
                 min_speech_s: float = 0.12,       # onset debounce
                 preroll_s: float = 0.2,           # context kept before onset
                 is_speech_fn: Optional[Callable[[np.ndarray], bool]] = None):
        if session.feature_norm == "per_feature":
            raise ValueError(
                "continuous mode streams unbounded audio; per_feature norm "
                "needs full-utterance stats (contract: "
                "normalize_requires_full_utterance)")
        self.session = session
        self._is_speech = is_speech_fn or (
            lambda hop: float(np.sqrt(np.mean(hop ** 2))) > energy_threshold)
        self._need_on = max(1, int(min_speech_s * 16000 / HOP))
        self._need_off = max(1, int(silence_s * 16000 / HOP))
        self._preroll: deque = deque(maxlen=max(1, int(preroll_s * 16000 / HOP)))
        self._carry = np.zeros(0, np.float32)   # sub-hop remainder
        self._pos = 0                           # absolute stream sample cursor
        self._in_speech = False
        self._on_run = 0
        self._off_run = 0
        self._seg_start = 0
        self.segments: List[dict] = []

    def push_audio(self, samples: np.ndarray) -> int:
        """Feed any amount of audio; returns segments finalized by it."""
        buf = np.concatenate([self._carry, np.asarray(samples, np.float32)])
        n_hops = len(buf) // HOP
        done = 0
        for k in range(n_hops):
            hop = buf[k * HOP : (k + 1) * HOP]
            done += self._hop(hop)
            self._pos += HOP
        self._carry = buf[n_hops * HOP :]
        return done

    def _hop(self, hop: np.ndarray) -> int:
        speech = self._is_speech(hop)
        if not self._in_speech:
            self._on_run = self._on_run + 1 if speech else 0
            self._preroll.append(hop)
            if self._on_run >= self._need_on:
                # onset: replay the pre-roll (context + the debounced
                # hops) into a fresh utterance, then continue live
                self._in_speech = True
                self._off_run = 0
                pre = list(self._preroll)
                self._preroll.clear()
                self._seg_start = self._pos - (len(pre) - 1) * HOP
                self.session.push_audio(np.concatenate(pre))
            return 0
        self.session.push_audio(hop)
        self._off_run = 0 if speech else self._off_run + 1
        if self._off_run >= self._need_off:
            self._endpoint()
            return 1
        return 0

    def _endpoint(self) -> None:
        s = self.session
        s.finalize()
        seg = {
            "text": s.text,
            "tokens": list(s._tokens),
            "start_s": self._seg_start / 16000.0,
            "end_s": (self._pos + HOP) / 16000.0,
        }
        try:
            seg["words"] = s.word_timestamps()
        except NotImplementedError:   # pragma: no cover - defensive
            seg["words"] = []
        self.segments.append(seg)
        # hand the segment's events to whoever polls the session? No —
        # continuous mode's contract is the segments list; the session is
        # recycled. Drain so stale events cannot leak into segment N+1.
        while s.poll_event() is not None:
            pass
        s.reset_utterance()
        self._in_speech = False
        self._on_run = 0
        self._off_run = 0

    def flush(self) -> int:
        """End of stream: finalize a segment still in flight."""
        if self._in_speech:
            self._endpoint()
            return 1
        return 0
