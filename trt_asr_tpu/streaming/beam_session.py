"""Streaming beam-search session — n-best decoding over the live stream.

Capability beyond the reference (greedy-only, cpp/src/parakeet_trt.cpp:
2914-3713) and beyond this repo's own offline beam
(models/parakeet/model.py transcribe_offline_beam): the frame-synchronous
TDT beam (decode/beam.py) is advanced chunk-by-chunk with the streaming
encoder, carrying the full hypothesis pool — scores, prefixes, per-branch
predictor states, time cursors — across push boundaries. Duration jumps
past a chunk's last frame leave the hypothesis "waiting" for future
frames, the beam analog of the greedy decoder's cross-chunk time_carry.

Division of labor per chunk:
- the streaming *encoder* step runs as one jitted device program (same
  caches/schedule as the greedy session — the encoder does not know how
  it is being decoded);
- the beam search runs on host over jitted single-step joint/predictor
  programs, exactly like the offline beam.

This is an accuracy-mode surface (n-best, shallow LM fusion, rescoring):
the host hypothesis loop costs more per chunk than the greedy session's
single fused device program, which remains the low-latency production
path. The fast-mode Pallas kernels (TRT_ASR_PALLAS_ATT/CONV/FFN/JOINT)
are greedy-hot-path features and intentionally do NOT apply here — the
beam encoder runs the XLA pos_proj path; nan_guard, profiler capture,
stage markers and the fault-injection cache overrides all do apply
(shared chunk prologue, session.py _chunk_inputs). Partials carry the *current best* hypothesis, which may rewrite
earlier text when the ranking flips — standard beam behavior, and the
reason the event protocol distinguishes PARTIAL from FINAL.

beam=1 reproduces the greedy session transcript token-for-token
(tests/test_beam_session.py), anchoring the streaming search to the
parity-tested greedy path.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, List, Optional, Tuple

import jax
import numpy as np

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode.beam import (
    BeamSearchState,
    beam_advance,
    beam_best,
    beam_finish,
    beam_start,
)
from trt_asr_tpu.models.parakeet.encoder import EncoderState, encode
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.session import Event, EventType, StreamingSession
from trt_asr_tpu.debug.stage_markers import stage_marker


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "drop_extra", "cache_drop", "valid_cap"),
    donate_argnames=("enc_state",),
)
def _beam_encode_step(params, cfg: ModelConfig, feats, valid,
                      enc_state: EncoderState, *, drop_extra: int,
                      cache_drop: int, valid_cap=None, pos_proj=None):
    """Encoder-only streaming step (the greedy session fuses decode into
    the same program; beam decodes on host, so the encoder output comes
    back)."""
    return encode(
        params, cfg, feats, valid[None] if valid.ndim == 0 else valid,
        enc_state, drop_extra=drop_extra, cache_drop=cache_drop,
        valid_cap=valid_cap, pos_proj=pos_proj)


class BeamStreamingSession(StreamingSession):
    """StreamingSession with the TDT beam as the decoder. Same input
    surface (push_audio/push_features/finalize/poll_event), same chunk
    schedule, same encoder program; ``nbest()`` after finalize returns the
    ranked hypotheses."""

    def __init__(self, model: ParakeetTDT, *, beam: int = 4,
                 expansion_k: int = 4, length_norm: float = 0.0,
                 lm_fn: Optional[Callable[[List[int], int], float]] = None,
                 lm_weight: float = 0.0, device: bool = False,
                 token_cap: int = 512, **kw):
        """``device=True`` runs the whole search on device
        (decode/beam_device.py): one jitted program advances the frontier
        over the chunk's encoder rows with no per-step host round trip —
        the n-best is bit-compatible with the host search (tests).
        Shallow fusion rides along: an NGramLM or BiasingLM ``lm_fn``
        compiles into device tables (decode/lm_device.py); only an
        arbitrary host callable still requires the host path. The other
        host-only capability is unbounded hypothesis length;
        ``token_cap`` bounds the device per-hypothesis token buffers."""
        self.beam = int(beam)
        self.expansion_k = int(expansion_k)
        self.length_norm = float(length_norm)
        self.lm_fn = lm_fn
        self.lm_weight = float(lm_weight)
        self.device = bool(device)
        self.token_cap = int(token_cap)
        self._lm_spec = self._lm_tables = None
        if self.device and lm_fn is not None:
            from trt_asr_tpu.decode.lm_device import to_device

            compiled = to_device(lm_fn)
            if compiled is None:
                raise ValueError(
                    "device beam supports lm_fn only for NGramLM / "
                    "BiasingLM (compiled to device tables); use "
                    "device=False for an arbitrary host callable")
            self._lm_spec, self._lm_tables = compiled
        self._nbest_hyps = []
        # the shared host-callable triplet (decode/beam.py make_host_fns:
        # jitted single-step joint/predictor + frontier-batched joint)
        from trt_asr_tpu.decode.beam import make_host_fns

        (self._joint_fn, self._predictor_fn,
         self._joint_batch_fn) = make_host_fns(model.params)
        super().__init__(model, **kw)

    # -- lifecycle ------------------------------------------------------

    def reset_utterance(self) -> None:
        super().reset_utterance()
        ds = self._dec_state   # prompt-primed by the parent reset
        if self.device:
            from trt_asr_tpu.decode.beam_device import init_beam_device_state

            self._dev_state = init_beam_device_state(
                self.cfg, ds, beam=self.beam, token_cap=self.token_cap)
            self._beam_state = BeamSearchState()   # refreshed on demand
        else:
            self._beam_state = beam_start(
                np.asarray(ds.g)[0], int(np.asarray(ds.y_id)[0]),
                (ds.h, ds.c), emitted_so_far=0)
        self._nbest_hyps = []
        self._sat_reported = False   # token_cap ERROR emitted once/utt
        # () not None: the no-tokens-yet state must compare equal to an
        # empty decode, or the first push emits a spurious empty partial
        # the greedy session never emits
        self._last_partial_tokens: Tuple[int, ...] = ()

    def snapshot(self) -> dict:  # pragma: no cover - explicit unsupported
        raise NotImplementedError(
            "beam sessions carry a host hypothesis pool; snapshot/restore "
            "(stream migration) is a greedy-session feature")

    def restore(self, snap: dict) -> None:  # pragma: no cover
        raise NotImplementedError(
            "beam sessions carry a host hypothesis pool; snapshot/restore "
            "(stream migration) is a greedy-session feature")

    # -- internals --------------------------------------------------------

    def _run_chunk(self, spec, is_last: bool) -> None:
        cfg = self.cfg
        rt = self.rt
        stage_marker(rt, f"beam chunk {spec.idx} enter [{self._debug_ctx}]")
        if self._profiler is not None:
            self._profiler.chunk_start()
        x, valid, cache_drop, pos_proj, _tq = self._chunk_inputs(
            spec, is_last)

        t0 = time.perf_counter()
        enc, out_len, self._enc_state = _beam_encode_step(
            self.model.params, cfg, x[None], np.int32(valid),
            self._enc_state, drop_extra=spec.drop_extra,
            cache_drop=cache_drop,
            valid_cap=None if is_last else cfg.valid_out_len,
            pos_proj=pos_proj)
        if self.device:
            # encoder rows never leave the device: the beam program
            # consumes them in place and only the small carried state
            # (scores + best tokens) is fetched for partials
            from trt_asr_tpu.decode.beam_device import tdt_beam_chunk_device

            self._dev_state = tdt_beam_chunk_device(
                self.model.params, cfg, enc[0],
                out_len[0].astype("int32"), self._dev_state,
                beam=self.beam, expansion_k=self.expansion_k,
                max_symbols=cfg.max_symbols_per_timestep,
                blank_penalty=rt.blank_penalty,
                punct_mask=(self.model.punct_mask
                            if rt.suppress_leading_punct else None),
                use_punct_mask=rt.suppress_leading_punct,
                lm_spec=self._lm_spec, lm_tables=self._lm_tables,
                lm_weight=self.lm_weight)
            score = np.asarray(self._dev_state.score)
            # token_cap overflow (beam_device.py module docstring): the
            # search keeps running with head-preserved truncated buffers,
            # but a live saturated hypothesis is surfaced once per
            # utterance so consumers know the transcript tail is cut
            if not self._sat_reported and bool(np.any(
                    np.asarray(self._dev_state.sat) & np.isfinite(score))):
                self._sat_reported = True
                self._error(
                    f"device beam token_cap={self.token_cap} saturated: "
                    "transcript truncated (head preserved); raise "
                    "token_cap or decode with the host beam (device=False)")
            best_i = int(np.argmax(score))
            n = int(np.asarray(self._dev_state.n_tok)[best_i])
            self._tokens = [int(t) for t in np.asarray(
                self._dev_state.tokens)[best_i, :n]]
            t_out = int(np.asarray(out_len)[0])
        else:
            t_out = int(np.asarray(out_len)[0])
            frames = np.asarray(enc)[0, :t_out]
            punct_ids = (set(np.flatnonzero(self.model.punct_mask).tolist())
                         if rt.suppress_leading_punct else None)
            self._beam_state = beam_advance(
                self._beam_state, frames, self._joint_fn, self._predictor_fn,
                blank_id=cfg.blank_id, token_head_size=cfg.token_head_size,
                duration_values=cfg.duration_values, beam=self.beam,
                expansion_k=self.expansion_k,
                max_symbols=cfg.max_symbols_per_timestep,
                blank_penalty=rt.blank_penalty, punct_token_ids=punct_ids,
                lm_fn=self.lm_fn, lm_weight=self.lm_weight,
                joint_batch_fn=self._joint_batch_fn)
            best = beam_best(self._beam_state)
            self._tokens = list(best.tokens) if best is not None else []
        self._frames_base += t_out
        ms = (time.perf_counter() - t0) * 1e3
        self._chunk_latencies_ms.append(ms)
        if ms > rt.slow_step_ms:
            stage_marker(rt, f"SLOW beam chunk {spec.idx}: {ms:.1f} ms",
                         force=True)
        if rt.nan_guard:
            from trt_asr_tpu.debug.nan_guard import check_finite

            check_finite(self._enc_state.att_cache, "att_cache",
                         halt=rt.nan_guard_halt)
        if self._profiler is not None:
            self._profiler.chunk_end()
        stage_marker(rt, f"beam chunk {spec.idx} exit "
                         f"({ms:.1f} ms, {len(self._tokens)} tokens best)")

    def _maybe_partial(self) -> None:
        # content-based change detection: a re-ranked beam can rewrite the
        # transcript at constant length (the parent's length check would
        # miss it)
        now = time.monotonic()
        cur = tuple(self._tokens)
        if (cur != self._last_partial_tokens
                and (now - self._last_partial_t) * 1e3
                    >= self.rt.partial_min_interval_ms):
            self._last_partial_t = now
            self._last_partial_tokens = cur
            with self._lock:
                self._events.append(Event(
                    EventType.PARTIAL_TEXT, self._segment,
                    self.model.tokenizer.decode(self._tokens),
                    tokens=list(self._tokens)))

    # -- results ----------------------------------------------------------

    def _host_pool(self) -> BeamSearchState:
        """The active pool as host Hypothesis objects (fetched from the
        device in device mode) so finish/nbest/stable-prefix share one
        implementation."""
        if self.device:
            from trt_asr_tpu.decode.beam_device import (
                beam_device_to_hypotheses,
            )

            return BeamSearchState(
                active=beam_device_to_hypotheses(self._dev_state))
        return self._beam_state

    def finalize(self) -> None:
        """End of utterance: flush the final short chunk, rank the pool,
        emit FinalText for the 1-best; ``nbest()`` has the full list."""
        if self._finalized:
            return
        spec = self._sched.flush(self._feat_buf.shape[0])
        if spec is not None:
            self._run_chunk(spec, is_last=True)
        self._nbest_hyps = beam_finish(
            self._host_pool(), beam=self.beam, length_norm=self.length_norm)
        self._tokens = (list(self._nbest_hyps[0].tokens)
                        if self._nbest_hyps else [])
        if self._nbest_hyps:
            # the 1-best's emission stamps feed the inherited
            # token_timestamps()/word_timestamps() surfaces (frames are
            # already global — the beam cursor is an absolute frame index)
            st = self._nbest_hyps[0].stamps
            self._token_frames = [f for f, _, _ in st]
            self._token_durs = [d for _, d, _ in st]
            self._token_logps = [lp for _, _, lp in st]
        self._finalized = True
        if self._taps is not None:
            self._taps.close()
        if self._profiler is not None:
            self._profiler.stop()
        with self._lock:
            self._events.append(Event(
                EventType.FINAL_TEXT, self._segment,
                self.model.tokenizer.decode(self._tokens),
                tokens=list(self._tokens)))

    @property
    def stable_text(self) -> str:
        """Committed transcript prefix: the token prefix every active
        hypothesis shares can never be rewritten by re-ranking (all future
        hypotheses descend from active ones) — the signal that lets a
        consumer display beam partials without flicker on the committed
        part. After finalize the whole 1-best is committed."""
        from trt_asr_tpu.decode.beam import beam_stable_prefix

        if self._finalized:
            return self.text
        return self.model.tokenizer.decode(
            beam_stable_prefix(self._host_pool()))

    def nbest(self) -> List[Tuple[str, List[int], float]]:
        """Ranked (text, token_ids, score) — after finalize the finished
        n-best, mid-stream the current pool's ordering."""
        hyps = (self._nbest_hyps if self._nbest_hyps
                else beam_finish(self._host_pool(), beam=self.beam,
                                 length_norm=self.length_norm))
        return [(self.model.tokenizer.decode(h.tokens), list(h.tokens),
                 h.score) for h in hyps]
