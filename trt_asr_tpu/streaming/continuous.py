"""Continuous transcription: energy endpointing over an endless stream.

Beyond-reference capability. The reference (and this repo's sessions)
transcribe ONE utterance per finalize/reset cycle; a live microphone or
call feed has no such boundaries. Two pieces:

- ``EndpointDetector`` — the deterministic hop-level state machine:
  per-10 ms-hop RMS against an absolute threshold with onset/offset
  run-length hysteresis and a pre-roll ring so the first phones are not
  clipped. Pure host code, no model in the loop; anything smarter (a VAD
  model) drops in via ``is_speech_fn``. Reused standalone by the serving
  daemon (serve.py continuous clients — one detector per client).
- ``ContinuousTranscriber`` — wraps any session (greedy or beam) with a
  detector: it streams speech hops into the session while speech lasts,
  and on a sustained-silence endpoint finalizes the segment, records it
  with absolute stream times, resets the session, and keeps listening —
  an unbounded stream becomes a list of utterance segments, each decoded
  by the exact single-utterance machinery (segments are token-exact with
  a dedicated session fed the same samples — tested, both decoders).

Semantics that make it composable with the session invariants:
- the session only ever sees the samples between segment start (including
  the pre-roll context) and the endpoint — so per-segment transcripts
  inherit push-granularity invariance from the session;
- ``feature_norm="per_feature"`` needs full-utterance stats and is
  therefore not supported here (contract:
  normalize_requires_full_utterance) — same restriction as the batch
  engine's raw-audio slots.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, List, Optional, Tuple

import numpy as np

from trt_asr_tpu.streaming.session import StreamingSession

HOP = 160          # 10 ms at 16 kHz — the mel hop, a natural VAD frame


class EndpointDetector:
    """Feed arbitrary-size audio; get back an ordered event list:

    ("onset",    (audio, start_sample)) — speech began; audio is the
                                          pre-roll + debounced onset hops
    ("speech",   hop_audio)             — one in-speech hop to forward
    ("endpoint", end_sample)            — sustained silence; segment over

    Events are cut at absolute hop positions (a sub-hop remainder is
    carried), so the event stream is invariant to push granularity."""

    def __init__(self, *, energy_threshold: float = 0.01,
                 silence_s: float = 0.6, min_speech_s: float = 0.12,
                 preroll_s: float = 0.2,
                 is_speech_fn: Optional[Callable[[np.ndarray], bool]] = None):
        self._is_speech = is_speech_fn or (
            lambda hop: float(np.sqrt(np.mean(hop ** 2))) > energy_threshold)
        self._need_on = max(1, int(min_speech_s * 16000 / HOP))
        self._need_off = max(1, int(silence_s * 16000 / HOP))
        # the ring must hold the whole onset-debounce run PLUS the wanted
        # pre-roll context — otherwise min_speech_s > preroll_s would
        # evict (and silently drop) the first debounced speech hops
        self._preroll: deque = deque(
            maxlen=self._need_on + max(1, int(preroll_s * 16000 / HOP)))
        self._carry = np.zeros(0, np.float32)
        self._pos = 0                       # absolute stream sample cursor
        self.in_speech = False
        self._on_run = 0
        self._off_run = 0

    def feed(self, samples: np.ndarray) -> List[Tuple[str, object]]:
        buf = np.concatenate([self._carry, np.asarray(samples, np.float32)])
        n_hops = len(buf) // HOP
        events: List[Tuple[str, object]] = []
        run: List[np.ndarray] = []   # contiguous in-speech hops coalesced
                                     # into ONE speech event (one feature
                                     # extraction / engine push per feed,
                                     # not one per 10 ms hop)
        for k in range(n_hops):
            hop = buf[k * HOP : (k + 1) * HOP]
            speech = self._is_speech(hop)
            if not self.in_speech:
                self._on_run = self._on_run + 1 if speech else 0
                self._preroll.append(hop)
                if self._on_run >= self._need_on:
                    self.in_speech = True
                    self._off_run = 0
                    pre = list(self._preroll)
                    self._preroll.clear()
                    start = self._pos - (len(pre) - 1) * HOP
                    events.append(("onset", (np.concatenate(pre), start)))
            else:
                run.append(hop)
                self._off_run = 0 if speech else self._off_run + 1
                if self._off_run >= self._need_off:
                    events.append(("speech", np.concatenate(run)))
                    run = []
                    events.append(("endpoint", self._pos + HOP))
                    self.in_speech = False
                    self._on_run = 0
                    self._off_run = 0
            self._pos += HOP
        if run:
            events.append(("speech", np.concatenate(run)))
        self._carry = buf[n_hops * HOP :]
        return events

    @property
    def pending_end(self) -> Optional[int]:
        """Non-mutating flush preview: the end sample a flush() would
        report, or None when no speech is in flight (callers that must
        do fallible work before committing — the daemon's slot rollover —
        read this first and flush() only on success)."""
        return self._pos if self.in_speech else None

    def flush(self) -> Optional[int]:
        """End of stream: if speech is in flight, return its end sample
        (caller finalizes); resets to the listening state. The end is
        ``_pos`` — the end of the last hop actually forwarded — so a
        dedicated re-decode of [start_s, end_s) sees exactly the samples
        the live session saw (a sub-hop carry never entered either)."""
        if not self.in_speech:
            return None
        self.in_speech = False
        self._on_run = 0
        self._off_run = 0
        return self._pos


class ContinuousTranscriber:
    def __init__(self, session: StreamingSession, *,
                 energy_threshold: float = 0.01,
                 silence_s: float = 0.6,
                 min_speech_s: float = 0.12,
                 preroll_s: float = 0.2,
                 is_speech_fn: Optional[Callable[[np.ndarray], bool]] = None):
        if session.feature_norm == "per_feature":
            raise ValueError(
                "continuous mode streams unbounded audio; per_feature norm "
                "needs full-utterance stats (contract: "
                "normalize_requires_full_utterance)")
        self.session = session
        self._det = EndpointDetector(
            energy_threshold=energy_threshold, silence_s=silence_s,
            min_speech_s=min_speech_s, preroll_s=preroll_s,
            is_speech_fn=is_speech_fn)
        self._seg_start = 0
        self.segments: List[dict] = []

    def push_audio(self, samples: np.ndarray) -> int:
        """Feed any amount of audio; returns segments finalized by it."""
        done = 0
        for kind, payload in self._det.feed(samples):
            if kind == "onset":
                audio, self._seg_start = payload
                self.session.push_audio(audio)
            elif kind == "speech":
                self.session.push_audio(payload)
            else:
                self._endpoint(payload)
                done += 1
        return done

    def _endpoint(self, end_sample: int) -> None:
        s = self.session
        s.finalize()
        seg = {
            "text": s.text,
            "tokens": list(s._tokens),
            "start_s": self._seg_start / 16000.0,
            "end_s": end_sample / 16000.0,
            "words": s.word_timestamps(),
        }
        self.segments.append(seg)
        # continuous mode's contract is the segments list; the session is
        # recycled. Drain so stale events cannot leak into segment N+1.
        while s.poll_event() is not None:
            pass
        s.reset_utterance()

    def flush(self) -> int:
        """End of stream: finalize a segment still in flight."""
        end = self._det.flush()
        if end is not None:
            self._endpoint(end)
            return 1
        return 0
