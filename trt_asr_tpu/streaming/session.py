"""Streaming session: the runtime core.

TPU-native replacement for the reference's ``ParakeetSession`` C++ hot path
(cpp/src/parakeet_trt.cpp:1557-3876): per-session streaming state, chunk
scheduling, encoder step + TDT greedy decode, event queue with partial/final
emission, prompt priming on reset, debug context.

Differences by design (SURVEY §3.2 "hot-loop structure to preserve"):
- encoder step + full decode loop run as ONE jitted device program per
  chunk; the host receives only the bounded token buffer (the reference
  round-tripped 8198 logits per decode step);
- session state {encoder caches, cache_len, h, c, g, y_id, time_carry} is a
  device-resident pytree threaded functionally (the reference's cache
  ping-pong pointer swap becomes functional state threading);
- audio -> feature conversion carries frame overlap across pushes (the
  reference recomputed features per chunk and dropped boundary samples).
"""

from __future__ import annotations

import functools
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from enum import IntEnum
from typing import Deque, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.decode import (
    DecodeState,
    init_decode_state,
    prime_decode_state,
    tdt_greedy_decode_chunk,
)
from trt_asr_tpu.frontend import StreamingLogMel, apply_per_feature_norm
from trt_asr_tpu.models.parakeet.encoder import (
    EncoderState,
    encode,
    init_encoder_state,
)
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.streaming.schedule import ChunkScheduler
from trt_asr_tpu.debug.stage_markers import stage_marker
from trt_asr_tpu.debug.nan_guard import check_finite
from trt_asr_tpu.debug.taps import maybe_tap_run
from trt_asr_tpu.debug.snapshot import maybe_snapshot_chunk


class EventType(IntEnum):
    PARTIAL_TEXT = 0   # PARAKEET_EVENT_PARTIAL_TEXT
    FINAL_TEXT = 1     # PARAKEET_EVENT_FINAL_TEXT
    ERROR = 2          # PARAKEET_EVENT_ERROR


@dataclass
class Event:
    type: EventType
    segment_id: int
    text: str = ""
    error_message: str = ""
    tokens: List[int] = field(default_factory=list)


class StreamingSession:
    def __init__(self, model: ParakeetTDT, runtime: Optional[RuntimeConfig] = None,
                 feature_norm: str = "none",
                 norm_stats: Optional[tuple] = None,
                 engines=None):
        self.model = model
        self.cfg = model.cfg
        self.rt = runtime or model.runtime
        self.feature_norm = feature_norm
        self.norm_stats = norm_stats
        # AOT engine serving (runtime/engine.py): when an EngineSet is
        # given, chunks whose program signature matches a built engine run
        # through the deserialized artifact (the reference's load-.engine-
        # and-execute path, parakeet_trt.cpp:1720-1738); misses fall back
        # to the live jit. Counters are test/diagnostic surface.
        self._engines = engines
        self._engine_key_memo = {}
        self.engine_hits = 0
        self.engine_misses = 0
        self._events: Deque[Event] = deque()
        self._lock = threading.Lock()
        self._debug_ctx = ""
        self._segment = 0
        self._chunk_latencies_ms: List[float] = []
        self._taps = maybe_tap_run(self.rt)
        from trt_asr_tpu.debug.profiler import maybe_profiler

        self._profiler = maybe_profiler(self.rt)
        # positional projections are input-independent for the (fixed)
        # streaming chunk shape — computed once per session, not per chunk
        from trt_asr_tpu.models.parakeet.encoder import precompute_pos_proj
        from trt_asr_tpu.ops.conv import subsampled_length

        frames = self.cfg.chunk_size_frames[1] + self.cfg.pre_encode_cache_size[1]
        tq = int(subsampled_length(np.asarray(frames), self.cfg.stride_stages)) \
            - self.cfg.drop_extra_pre_encoded  # 57 frames -> 8 steps - 2 = 6
        self._pos_proj = precompute_pos_proj(model.params, self.cfg, tq,
                                             self.cfg.att_cache_size)
        self._tq_steady = tq
        # seconds per encoder output frame (mel hop x subsampling): the
        # frame->time scale for token/word timestamps
        fs = self.model.frontend.spec
        self._enc_frame_s = fs.hop_length / fs.sample_rate_hz * self.cfg.subsampling_factor
        self._pos_projT = None
        self._pad_steps = 0
        if self.rt.use_pallas_att:
            # fused attention-block kernel path: steps padded to the MXU
            # sublane multiple; positional table precomputed transposed and
            # lane-padded for the in-kernel q_v @ posT matmul
            from trt_asr_tpu.ops.pallas.att_block_kernel import _round_up

            tq_pad = _round_up(tq, 8)
            self._pad_steps = tq_pad - tq
            pp = precompute_pos_proj(model.params, self.cfg, tq_pad,
                                     self.cfg.att_cache_size)
            r_pad = _round_up(pp.shape[1], 128)
            ppT = jnp.zeros((self.cfg.num_layers, self.cfg.d_model, r_pad),
                            pp.dtype)
            self._pos_projT = ppT.at[:, :, : pp.shape[1]].set(
                jnp.swapaxes(pp, 1, 2))
        self.reset_utterance()

    # -- lifecycle ------------------------------------------------------

    def reset_utterance(self) -> None:
        stage_marker(self.rt, "reset_utterance enter")
        cfg = self.cfg
        self._mel = StreamingLogMel(self.model.frontend)
        self._feat_buf = np.zeros((0, cfg.feat_in), np.float32)
        self._sched = ChunkScheduler(cfg)
        self._enc_state = init_encoder_state(cfg, 1)
        self._dec_state = prime_decode_state(
            self.model.params, cfg, init_decode_state(cfg, 1), self.model.prompt_ids)
        self._tokens: List[int] = []
        self._token_frames: List[int] = []  # absolute encoder frame per token
        self._token_durs: List[int] = []    # predicted TDT duration per token
        self._token_logps: List[float] = [] # decode-time log-prob per token
        self._frames_base = 0               # encoder frames decoded so far
        self.tdt_steps: List[dict] = []   # debug_tdt_steps per-step records
        self._last_partial_t = 0.0
        self._last_partial_len = 0
        self._finalized = False
        self._segment += 1
        stage_marker(self.rt, "reset_utterance exit")

    def set_debug_context(self, ctx: str) -> None:
        self._debug_ctx = ctx

    # -- snapshot / restore (stream migration) ---------------------------

    def snapshot(self) -> dict:
        """Serialize the complete per-stream state (SURVEY §5: the state a
        multi-stream server must snapshot per stream — encoder caches in
        contract layout, predictor h/c/g, y_id, tokens, decode time carry,
        scheduler progress). Restorable in another process via restore()."""
        from trt_asr_tpu.models.parakeet.encoder import state_to_contract

        enc = {k: np.asarray(v) for k, v in state_to_contract(self._enc_state).items()}
        d = self._dec_state
        return {
            "encoder": enc,
            "decoder": {"g": np.asarray(d.g), "h": np.asarray(d.h),
                        "c": np.asarray(d.c), "y_id": np.asarray(d.y_id),
                        "time_carry": np.asarray(d.time_carry)},
            "tokens": list(self._tokens),
            "token_frames": list(self._token_frames),
            "token_durs": list(self._token_durs),
            "token_logps": list(self._token_logps),
            "frames_base": self._frames_base,
            "feat_buf": self._feat_buf.copy(),
            "mel_carry": self._mel._carry.copy(),
            "sched": {"idx": self._sched._idx, "start": self._sched._start},
            "segment": self._segment,
            "finalized": self._finalized,
        }

    def restore(self, snap: dict) -> None:
        """Inverse of snapshot(): resume a stream exactly where it left off
        (continuation is transcript-identical — tested)."""
        from trt_asr_tpu.decode.tdt_greedy import DecodeState
        from trt_asr_tpu.models.parakeet.encoder import state_from_contract

        self._enc_state = state_from_contract(
            {k: jnp.asarray(v) for k, v in snap["encoder"].items()},
            self.model.params)
        dd = snap["decoder"]
        self._dec_state = DecodeState(
            g=jnp.asarray(dd["g"]), h=jnp.asarray(dd["h"]), c=jnp.asarray(dd["c"]),
            y_id=jnp.asarray(dd["y_id"]), time_carry=jnp.asarray(dd["time_carry"]))
        self._tokens = list(snap["tokens"])
        self._token_frames = list(snap.get("token_frames", []))
        self._token_durs = list(snap.get("token_durs", []))
        self._token_logps = list(snap.get("token_logps", []))
        self._frames_base = snap.get("frames_base", 0)
        self._feat_buf = snap["feat_buf"].copy()
        self._mel._carry = snap["mel_carry"].copy()
        self._sched._idx = snap["sched"]["idx"]
        self._sched._start = snap["sched"]["start"]
        self._segment = snap["segment"]
        self._finalized = snap["finalized"]
        self._last_partial_len = len(self._tokens)

    # -- input ----------------------------------------------------------

    def push_audio(self, samples: np.ndarray,
                   stream_pos: Optional[int] = None) -> int:
        """``stream_pos``: this chunk's sample offset in the SOURCE stream
        (optional). When the capture side dropped audio, the tap writer
        zero-fills the hole and counts it (reference audio_tap.h gap
        filling), keeping tap replay time-aligned with the source."""
        if self._taps is not None:
            self._taps.audio().write(np.asarray(samples, np.float32),
                                     {"ctx": self._debug_ctx},
                                     stream_pos=stream_pos)
        feats = self._mel.push(np.asarray(samples, np.float32))
        return self.push_features(feats)

    def push_features(self, feats: np.ndarray) -> int:
        """feats [T, C]. Returns number of chunks processed."""
        if self._finalized:
            self._error("push after finalize; call reset_utterance")
            return 0
        try:
            if feats.size:
                feats = np.asarray(feats, np.float32)
                if feats.ndim != 2 or feats.shape[1] != self.cfg.feat_in:
                    # hard-fail contract check (reference parakeet_trt.cpp
                    # shape-violation throws -> ERROR events): a wrong mel
                    # count otherwise decodes plausible-looking garbage
                    # (r3 gate: native CLI defaulted to 128 mels against a
                    # 32-mel model)
                    raise ValueError(
                        f"push_features: expected [T, {self.cfg.feat_in}] "
                        f"features, got {feats.shape}")
                feats = self._normalize(feats)
                if self._taps is not None:
                    self._taps.features(n_mels=self.cfg.feat_in).write(
                        feats, {"ctx": self._debug_ctx})
                self._feat_buf = np.concatenate([self._feat_buf, feats], axis=0)
            done = 0
            while True:
                spec = self._sched.next_ready(self._feat_buf.shape[0])
                if spec is None:
                    break
                self._run_chunk(spec, is_last=False)
                done += 1
            self._maybe_partial()
            if self.rt.final_on_push and done:
                # reference emits a final event per push in non-streaming
                # mode (parakeet_trt.cpp:3802-3826); the utterance stays open
                with self._lock:
                    self._events.append(Event(
                        EventType.FINAL_TEXT, self._segment,
                        self.model.tokenizer.decode(self._tokens),
                        tokens=list(self._tokens)))
            return done
        except Exception as e:  # noqa: BLE001 — surfaced as ERROR event (C-ABI parity)
            self._error(f"push_features failed: {e!r}")
            raise

    def finalize(self) -> None:
        """End of utterance: flush the final short chunk, emit FinalText."""
        if self._finalized:
            return
        spec = self._sched.flush(self._feat_buf.shape[0])
        if spec is not None:
            self._run_chunk(spec, is_last=True)
        self._finalized = True
        if self.rt.debug_tdt_steps and self.rt.tdt_trace_path:
            from trt_asr_tpu.debug.tdt_trace import write_ndjson

            write_ndjson(self.rt.tdt_trace_path, self.tdt_steps,
                         blank_id=self.cfg.blank_id, emitted=len(self._tokens))
        if self._taps is not None:
            self._taps.close()
        if self._profiler is not None:
            self._profiler.stop()   # flush a short capture on finalize
        if self.rt.debug_blank_scan and self.tdt_steps:
            # reference PARAKEET_DEBUG_BLANK_SCAN summary
            # (parakeet_trt.cpp:2858-2870): blank-vs-emit preference counts
            # over the production decode steps
            steps = len(self.tdt_steps)
            blanks = sum(r["is_blank"] for r in self.tdt_steps)
            clamped = sum(bool(r.get("blank_dur0_clamped")) for r in self.tdt_steps)
            stage_marker(self.rt,
                         f"blank_scan: steps={steps} blank_pref={blanks} "
                         f"nonblank_pref={steps - blanks} dur0_clamped={clamped}",
                         force=True)
        with self._lock:
            self._events.append(Event(EventType.FINAL_TEXT, self._segment,
                                      self.model.tokenizer.decode(self._tokens),
                                      tokens=list(self._tokens)))

    # -- events ----------------------------------------------------------

    def poll_event(self) -> Optional[Event]:
        with self._lock:
            return self._events.popleft() if self._events else None

    @property
    def text(self) -> str:
        return self.model.tokenizer.decode(self._tokens)

    @property
    def stable_text(self) -> str:
        """Committed transcript prefix — text no future decoding can
        rewrite. Greedy decoding never revises emitted tokens, so this is
        the whole transcript; the beam session overrides it with the
        hypothesis pool's common prefix (decode/beam.py
        beam_stable_prefix)."""
        return self.text

    def token_timestamps(self) -> List[dict]:
        """Frame-anchored per-token timestamps (capability beyond the
        reference, whose events carry text only): one record per emitted
        token — token id, piece, absolute [start_s, end_s] within the
        utterance. Exact decode-time anchors, not a forced alignment."""
        from trt_asr_tpu.decode.timestamps import token_intervals

        iv = token_intervals(self._token_frames, self._token_durs,
                             self._enc_frame_s)
        return [{"token": int(t), "piece": self.model.tokenizer.token_at(int(t)),
                 "logp": round(lp, 4), **span}
                for t, lp, span in zip(self._tokens, self._token_logps, iv)]

    def word_timestamps(self) -> List[dict]:
        """Word-level [start_s, end_s] intervals grouped at SentencePiece
        word boundaries (decode/timestamps.py)."""
        from trt_asr_tpu.decode.timestamps import word_intervals

        return word_intervals(self._tokens, self._token_frames,
                              self._token_durs, self.model.tokenizer,
                              self._enc_frame_s, logps=self._token_logps)

    @property
    def chunk_latencies_ms(self) -> List[float]:
        return list(self._chunk_latencies_ms)

    # -- internals --------------------------------------------------------

    def _normalize(self, feats: np.ndarray) -> np.ndarray:
        if self.feature_norm == "per_feature":
            if self.norm_stats is None:
                raise ValueError(
                    "per_feature norm needs full-utterance stats; pass norm_stats "
                    "(contract: normalize_requires_full_utterance)")
            mean, std = self.norm_stats
            return np.asarray(apply_per_feature_norm(feats, mean, std))
        return feats

    def _chunk_inputs(self, spec, is_last: bool):
        """Shared chunk prologue (greedy and beam sessions): window
        extraction, implicit-zero valid count, cache_drop, cache
        fault-injection overrides, steady-shape positional table.
        Returns (x, valid, cache_drop, pos_proj, tq_chunk)."""
        cfg = self.cfg
        rt = self.rt
        from trt_asr_tpu.streaming.schedule import extract_chunk

        x = extract_chunk(self._feat_buf, spec)
        # valid = implicit left zeros (unified first chunk) + real frames
        buflen = self._feat_buf.shape[0]
        valid = (max(-spec.slice_start, 0)
                 + max(min(spec.slice_end, buflen) - max(spec.slice_start, 0), 0))
        cache_drop = 0 if is_last else cfg.cache_drop_size
        if rt.disable_cache:
            self._enc_state = init_encoder_state(cfg, 1)
        if rt.cache_len_override >= 0:
            # fault injection: force cache_len_in (reference
            # PARAKEET_CACHE_LEN_OVERRIDE, parakeet_trt.cpp:2175-2214),
            # clamped to capacity
            forced = min(rt.cache_len_override, cfg.att_cache_size)
            self._enc_state = self._enc_state._replace(
                cache_len=jnp.full_like(self._enc_state.cache_len, forced))
        # pos_proj is shape-specific: only pass it when this chunk's
        # post-drop step count matches the steady profile
        tq_chunk = spec.frames
        for _ in range(cfg.stride_stages):
            tq_chunk = (tq_chunk - 1) // 2 + 1
        tq_chunk -= spec.drop_extra
        pos_proj = (self._pos_proj
                    if tq_chunk * 2 - 1 + cfg.att_cache_size == self._pos_proj.shape[1]
                    else None)
        return x, valid, cache_drop, pos_proj, tq_chunk

    def _step_kwargs(self, spec, is_last: bool):
        """The exact ``(args, kwargs)`` the fused chunk program is invoked
        with — the single source of truth shared by the live path
        (_run_chunk) and the AOT engine builder (runtime/engine.py
        session_program_specs), so serialized engines can never drift from
        the serving signature."""
        cfg = self.cfg
        rt = self.rt
        x, valid, cache_drop, pos_proj, tq_chunk = self._chunk_inputs(
            spec, is_last)
        # fused attention kernel only for the steady chunk shape (off-profile
        # chunks fall back to the XLA path — exactness proven equal)
        pal_att = self._pos_projT is not None and tq_chunk == self._tq_steady
        args = (self.model.params, cfg, x[None], np.int32(valid),
                self._enc_state, self._dec_state)
        kwargs = dict(
            drop_extra=spec.drop_extra, cache_drop=cache_drop,
            valid_cap=None if is_last else cfg.valid_out_len,
            blank_penalty=rt.blank_penalty,
            emitted_so_far=np.int32(len(self._tokens)),
            punct_mask=jnp.asarray(self.model.punct_mask) if rt.suppress_leading_punct else None,
            use_punct_mask=rt.suppress_leading_punct,
            pos_proj=None if pal_att else pos_proj,
            pos_projT=self._pos_projT if pal_att else None,
            pad_steps=self._pad_steps if pal_att else 0,
            use_pallas_att=pal_att,
            use_pallas_conv=rt.use_pallas_conv,
            use_pallas_ffn=rt.use_pallas_ffn,
            use_pallas_joint=rt.use_pallas_joint,
            trace=rt.debug_tdt_steps or rt.debug_blank_scan,
            use_batched_decode=rt.batched_decode,
            with_timestamps=True)
        return args, kwargs

    def _run_chunk(self, spec, is_last: bool) -> None:
        rt = self.rt
        stage_marker(rt, f"chunk {spec.idx} enter [{self._debug_ctx}]")
        if self._profiler is not None:
            self._profiler.chunk_start()
        args, kwargs = self._step_kwargs(spec, is_last)

        t0 = time.perf_counter()
        out = None
        if self._engines is not None:
            # memo key = chunk geometry + EVERY static kwarg value (the
            # scalar kwargs are exactly the jit statics; traced scalars are
            # numpy types and filtered out). A per-chunk static or mid-
            # session rt mutation therefore changes the key instead of
            # silently mapping onto a stale memoized program signature.
            memo_key = (spec.frames, spec.drop_extra, is_last, tuple(sorted(
                (k, v) for k, v in kwargs.items()
                if isinstance(v, (bool, int, float, str, type(None))))))
            prog_key = self._engine_key_memo.get(memo_key)
            if prog_key is None:
                from trt_asr_tpu.runtime.engine import program_key

                prog_key = program_key(args, kwargs)
                self._engine_key_memo[memo_key] = prog_key
            prog = self._engines.get(prog_key)
            if prog is not None:
                out = self._engines.call(prog, args, kwargs)
                self.engine_hits += 1
            else:
                self.engine_misses += 1
        if out is None:
            out = _session_step(*args, **kwargs)
        if rt.debug_tdt_steps or rt.debug_blank_scan:
            (toks, n, self._enc_state, self._dec_state, stamps, t_out,
             (rec_buf, n_steps)) = out
            from trt_asr_tpu.debug.tdt_trace import records_from_buffer

            self.tdt_steps.extend(records_from_buffer(rec_buf, int(n_steps)))
        else:
            toks, n, self._enc_state, self._dec_state, stamps, t_out = out
        if rt.sabotage == "drop_time_carry":
            # fault injection (gate-sensitivity proof): reproduce the
            # reference's while-loop-reset bug — duration overshoot dropped
            # at every push boundary (parakeet_trt.cpp:2914)
            self._dec_state = self._dec_state._replace(
                time_carry=jnp.zeros_like(self._dec_state.time_carry))
        n = int(n)
        new = [int(t) for t in np.asarray(toks)[:n]]
        self._token_frames.extend(
            self._frames_base + int(f) for f in np.asarray(stamps[0])[:n])
        self._token_durs.extend(int(d) for d in np.asarray(stamps[1])[:n])
        self._token_logps.extend(float(c) for c in np.asarray(stamps[2])[:n])
        self._frames_base += int(t_out)
        ms = (time.perf_counter() - t0) * 1e3
        self._chunk_latencies_ms.append(ms)
        if ms > rt.slow_step_ms:
            stage_marker(rt, f"SLOW chunk {spec.idx}: {ms:.1f} ms", force=True)
        if rt.nan_guard:
            check_finite(self._enc_state.att_cache, "att_cache", halt=rt.nan_guard_halt)
        self._tokens.extend(new)
        if rt.debug_emit_tokens and new:
            stage_marker(rt, f"chunk {spec.idx} emitted {new}", force=True)
        maybe_snapshot_chunk(rt, spec.idx, enc_state=self._enc_state,
                             dec_state=self._dec_state, tokens=new)
        if self._profiler is not None:
            self._profiler.chunk_end()
        stage_marker(rt, f"chunk {spec.idx} exit ({ms:.1f} ms, {n} tokens)")

    def _maybe_partial(self) -> None:
        now = time.monotonic()
        if (len(self._tokens) != self._last_partial_len
                and (now - self._last_partial_t) * 1e3 >= self.rt.partial_min_interval_ms):
            self._last_partial_t = now
            self._last_partial_len = len(self._tokens)
            with self._lock:
                self._events.append(Event(EventType.PARTIAL_TEXT, self._segment,
                                          self.model.tokenizer.decode(self._tokens),
                                          tokens=list(self._tokens)))

    def _error(self, msg: str) -> None:
        with self._lock:
            self._events.append(Event(EventType.ERROR, self._segment, error_message=msg))


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "drop_extra", "cache_drop", "valid_cap", "blank_penalty",
                     "use_punct_mask", "use_pallas_joint", "trace", "pad_steps",
                     "use_pallas_att", "use_pallas_conv", "use_pallas_ffn",
                     "use_batched_decode", "with_timestamps"),
    donate_argnames=("enc_state", "dec_state"),
)
def _session_step(params, cfg: ModelConfig, feats, valid, enc_state: EncoderState,
                  dec_state: DecodeState, *, drop_extra: int, cache_drop: int,
                  valid_cap=None,
                  blank_penalty: float, emitted_so_far, punct_mask, use_punct_mask: bool,
                  pos_proj=None, pos_projT=None, pad_steps: int = 0,
                  use_pallas_att: bool = False, use_pallas_conv: bool = False,
                  use_pallas_ffn: bool = False,
                  use_pallas_joint: bool = False, trace: bool = False,
                  use_batched_decode: bool = False,
                  with_timestamps: bool = False):
    """One fused device program: streaming encoder step + TDT decode loop.

    trace=True (RuntimeConfig.debug_tdt_steps) additionally returns the
    bounded per-step decode record buffer (see debug/tdt_trace.py).
    with_timestamps=True appends ``(frames, durs), t_out`` — per-token
    within-chunk emission frames/durations plus this chunk's valid encoder
    step count (the session's frame-base advance)."""
    enc, out_len, enc_state = encode(
        params, cfg, feats, valid[None] if valid.ndim == 0 else valid,
        enc_state, drop_extra=drop_extra, cache_drop=cache_drop,
        valid_cap=valid_cap, pos_proj=pos_proj, pos_projT=pos_projT,
        pad_steps=pad_steps, use_pallas_att=use_pallas_att,
        use_pallas_conv=use_pallas_conv, use_pallas_ffn=use_pallas_ffn)
    tq = enc.shape[1]
    if use_batched_decode and not trace:
        # blank-run batched decode at B=1: joint matmuls run O(emits), not
        # O(steps) — measured ~20% faster than the per-step loop
        # (artifacts/perf/b1_sweep.json bpallas vs spallas). Token-exact
        # with the loop (tests/test_batched_decode.py).
        from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch

        out = tdt_greedy_decode_batch(
            params, cfg, enc, out_len.astype(jnp.int32), dec_state,
            max_tokens=cfg.max_symbols_per_timestep * tq,
            blank_penalty=blank_penalty,
            emitted_so_far=jnp.asarray(emitted_so_far).reshape(1),
            punct_mask=punct_mask, use_punct_mask=use_punct_mask,
            use_pallas_joint=use_pallas_joint,
            with_timestamps=with_timestamps)
        if with_timestamps:
            toks_b, n_b, dec_state, (fr, du, lp) = out
            return (toks_b[0], n_b[0], enc_state, dec_state,
                    (fr[0], du[0], lp[0]), out_len[0])
        toks_b, n_b, dec_state = out
        return toks_b[0], n_b[0], enc_state, dec_state
    out = tdt_greedy_decode_chunk(
        params, cfg, enc[0], out_len[0].astype(jnp.int32), dec_state,
        max_tokens=cfg.max_symbols_per_timestep * tq,
        blank_penalty=blank_penalty, emitted_so_far=emitted_so_far,
        punct_mask=punct_mask, use_punct_mask=use_punct_mask,
        use_pallas_joint=use_pallas_joint, trace=trace,
        with_timestamps=with_timestamps)
    toks, n, dec_state = out[:3]
    rest = out[3:]
    ret = (toks, n, enc_state, dec_state)
    if with_timestamps:
        ret = ret + (rest[0], out_len[0])
        rest = rest[1:]
    if trace:
        ret = ret + (rest[0],)
    return ret
