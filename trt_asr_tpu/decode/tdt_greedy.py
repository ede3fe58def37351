"""On-device TDT greedy decode: a single fused ``lax.while_loop``.

The reference's decode loop round-trips to the host every step: joint
enqueue -> D2H of 8198 logits -> host argmax -> predictor enqueue -> sync
(parakeet_trt.cpp:2914-3713 — its main inefficiency, called out in SURVEY
§3.2). Here the entire loop lives on device: per-step work is one dynamic
row slice of the precomputed encoder projection, two small matmuls
(pred+out joint projections), two argmaxes, and a ``lax.cond``-gated LSTM
step that runs ONLY on non-blank emissions (preserving the reference's
predictor-only-on-emit structure). The host receives one bounded token
buffer per chunk.

Semantics identical to host_decode.py (the parity test for this kernel).
Termination: every iteration either advances time or increments the
per-timestep symbol count; at max_symbols the advance is forced
(reference :3665-3676), so the loop is bounded by t_enc * max_symbols.

Blank-run batching (the key TPU decode optimization): ``g`` — the cached
predictor output — changes ONLY on token emission, so the joint logits of
EVERY time step of the chunk are computed in one batched [Tq, V] matmul
per g-value, and the argmax token/duration vectors are carried through the
loop until the next emission marks them stale. Decode-loop matmul count
drops from O(#steps) to O(#emits + 1) per chunk; the per-step work between
emissions is two vector lookups and scalar control flow. Decisions are
bit-identical to the per-step formulation (the walk only consumes rows it
would have computed with the same g).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.joint import joint_from_projected, joint_project_enc
from trt_asr_tpu.models.parakeet.predictor import predictor_step


class DecodeState(NamedTuple):
    """Per-stream decode carry (persists across chunks within an utterance).

    Mirrors the reference's per-session decode state {h, c, g, y_id}
    (docs/ARCHITECTURE_RUNTIME.md:52-66) plus ``time_carry``: a duration
    jump that overshoots the chunk end is carried into the next chunk, so
    chunked decoding is exactly equivalent to whole-utterance decoding (the
    reference dropped the overshoot at each push boundary — while-loop reset
    at parakeet_trt.cpp:2914 — a subtle semantic divergence we fix)."""

    g: jnp.ndarray           # [B, P] cached predictor output
    h: jnp.ndarray           # [R, B, P]
    c: jnp.ndarray           # [R, B, P]
    y_id: jnp.ndarray        # [B] int32
    time_carry: jnp.ndarray  # [B] int32 overshoot into the next chunk


def init_decode_state(cfg: ModelConfig, batch: int = 1, dtype=jnp.float32) -> DecodeState:
    return DecodeState(
        g=jnp.zeros((batch, cfg.pred_hidden), dtype),
        h=jnp.zeros((cfg.pred_rnn_layers, batch, cfg.pred_hidden), dtype),
        c=jnp.zeros((cfg.pred_rnn_layers, batch, cfg.pred_hidden), dtype),
        y_id=jnp.full((batch,), cfg.blank_id, jnp.int32),
        time_carry=jnp.zeros((batch,), jnp.int32),
    )


def prime_decode_state(params: Dict[str, Any], cfg: ModelConfig, state: DecodeState,
                       prompt_ids) -> DecodeState:
    """Seed predictor state with prompt tokens BEFORE any audio (reference
    parakeet_reset_utterance priming, :1884-1942). prompt_ids: python list."""
    g, h, c, y = state.g, state.h, state.c, state.y_id
    for tok in prompt_ids:
        y = jnp.full_like(state.y_id, tok)
        g, h, c = predictor_step(params["predictor"], y, h, c)
    if not prompt_ids:
        # NeMo fallback: prime with blank (zero embedding)
        g, h, c = predictor_step(params["predictor"], y, h, c)
    return DecodeState(g=g, h=h, c=c, y_id=y, time_carry=state.time_carry)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_tokens", "max_symbols", "use_punct_mask",
                     "blank_penalty", "use_pallas_joint", "pallas_interpret",
                     "trace", "with_timestamps"),
)
def tdt_greedy_decode_chunk(
    params: Dict[str, Any],
    cfg: ModelConfig,
    enc: jnp.ndarray,              # [T, D] encoder output (single stream)
    t_enc: jnp.ndarray,            # scalar int32 valid steps
    state: DecodeState,            # batch dim B=1 inside
    *,
    max_tokens: int,
    max_symbols: Optional[int] = None,
    blank_penalty: float = 0.0,
    emitted_so_far: jnp.ndarray = None,
    punct_mask: Optional[jnp.ndarray] = None,   # [V+1] bool
    use_punct_mask: bool = False,
    use_pallas_joint: bool = False,
    pallas_interpret=None,
    trace: bool = False,
    with_timestamps: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
    """Decode one chunk on device.

    Returns (tokens [max_tokens] int32 (-1 padded), n_emitted, new_state).
    use_pallas_joint fuses the per-step joint work (pred proj + relu + out
    proj + dual argmax) into one Pallas kernel (~3x fewer per-iteration ops
    — ops/pallas/joint_step_kernel.py).

    with_timestamps=True additionally returns ``(frames, durs, logps)`` —
    per emitted token, the within-chunk encoder frame index it was emitted
    at, its predicted TDT duration (both [max_tokens] int32, -1 padded),
    and its decode-time confidence: the log-softmax probability of the
    emitted token under the (blank-penalized) token head ([max_tokens]
    f32, 0 padded). TDT emissions are frame-anchored by construction, so
    these are exact decode-time token timestamps — capability the
    reference lacks (its events carry text only, parakeet_trt.cpp:680-690).

    trace=True additionally returns a bounded per-step record buffer
    ``(records [T*max_symbols, 7] int32, n_steps)`` with columns
    (time_idx, u, y_id, best_tok, duration, advance, is_blank) — the
    production-loop analog of the reference's PARAKEET_DEBUG_TDT_STEPS
    NDJSON (cpp/src/parakeet_trt.cpp:667-687,3429-3449), consumable by
    tools/parity/compare_tdt_trace.py via debug/tdt_trace.py.
    """
    max_symbols = max_symbols or cfg.max_symbols_per_timestep
    blank = cfg.blank_id
    ths = cfg.token_head_size
    dur_values = jnp.asarray(cfg.duration_values, jnp.int32)
    if emitted_so_far is None:
        emitted_so_far = jnp.zeros((), jnp.int32)

    enc_proj = joint_project_enc(params["joint"], enc[None])[0]   # [T, J]
    tq = enc_proj.shape[0]
    if use_pallas_joint:
        from trt_asr_tpu.ops.pallas.joint_step_kernel import (
            joint_step_pallas_prepadded, pad_joint_weights)

        padded_w = pad_joint_weights(params["joint"])   # once, outside the loop

    def compute_vecs(g, n):
        """Token/duration argmax for EVERY chunk step under the current g
        (one batched matmul — see module docstring, blank-run batching).
        with_timestamps additionally yields each step's argmax log-softmax
        probability (confidence) from the same logits."""
        if use_pallas_joint:
            g_rows = jnp.broadcast_to(g, (tq, g.shape[-1]))
            toks, dur_sel, logits_full = joint_step_pallas_prepadded(
                enc_proj, g_rows, *padded_w, ths=ths,
                ndur=cfg.num_duration_bins, blank_id=blank,
                blank_penalty=blank_penalty, interpret=pallas_interpret)
            tok_logits = logits_full[:, :ths]   # pre-penalty (kernel output)
            if blank_penalty:
                tok_logits = tok_logits.at[:, blank].add(-blank_penalty)
        else:
            logits = joint_from_projected(params["joint"], enc_proj, g)  # [T, V]
            tok_logits = logits[:, :ths]
            if blank_penalty:
                tok_logits = tok_logits.at[:, blank].add(-blank_penalty)
            dur_logits = lax.dynamic_slice_in_dim(logits, ths,
                                                  cfg.num_duration_bins, axis=1)
            toks = jnp.argmax(tok_logits, axis=1).astype(jnp.int32)
            dur_sel = jnp.argmax(dur_logits, axis=1)
        if use_punct_mask and punct_mask is not None:
            first = (emitted_so_far + n) == 0
            toks = jnp.where(first & punct_mask[toks], blank, toks)
        if with_timestamps:
            conf = (jnp.take_along_axis(tok_logits, toks[:, None], axis=1)[:, 0]
                    - jax.nn.logsumexp(tok_logits, axis=1)).astype(jnp.float32)
        else:
            conf = jnp.zeros((tq,), jnp.float32)
        return toks, dur_values[dur_sel].astype(jnp.int32), conf

    def cond(carry):
        return carry[0] < t_enc

    def body(carry):
        (time_idx, u_count, dstate, tokens, n, stale, tok_vec, dur_vec,
         conf_vec, stamps, aux) = carry
        tok_vec, dur_vec, conf_vec = lax.cond(
            stale, lambda _: compute_vecs(dstate.g[0:1], n),
            lambda _: (tok_vec, dur_vec, conf_vec), None)

        best_tok = tok_vec[time_idx]
        duration = dur_vec[time_idx]
        is_blank = best_tok == blank
        advance = jnp.where(is_blank & (duration == 0), 1, duration)

        if trace:
            records, step_i = aux
            row = jnp.stack([time_idx, u_count, dstate.y_id[0], best_tok,
                             duration.astype(jnp.int32), advance.astype(jnp.int32),
                             is_blank.astype(jnp.int32)])
            records = lax.dynamic_update_slice_in_dim(
                records, row[None], jnp.minimum(step_i, records.shape[0] - 1), axis=0)
            aux = (records, step_i + 1)

        # forced advance after max_symbols emissions without progress
        hit_cap = u_count >= (max_symbols - 1)
        advance = jnp.where((advance == 0) & hit_cap, 1, advance)

        # emit + predictor step only on non-blank
        def do_emit(ds):
            y = jnp.full_like(ds.y_id, best_tok)
            g, h, c = predictor_step(params["predictor"], y, ds.h, ds.c)
            return DecodeState(g=g, h=h, c=c, y_id=y, time_carry=ds.time_carry)

        emit = (~is_blank) & (n < max_tokens)
        new_dstate = lax.cond(emit, do_emit, lambda ds: ds, dstate)
        tokens = tokens.at[jnp.where(emit, n, max_tokens)].set(
            jnp.where(emit, best_tok, -1), mode="drop")
        if with_timestamps:
            frames_buf, durs_buf, logps_buf = stamps
            idx = jnp.where(emit, n, max_tokens)
            frames_buf = frames_buf.at[idx].set(
                jnp.where(emit, time_idx, -1), mode="drop")
            durs_buf = durs_buf.at[idx].set(
                jnp.where(emit, duration.astype(jnp.int32), -1), mode="drop")
            logps_buf = logps_buf.at[idx].set(
                jnp.where(emit, conf_vec[time_idx], 0.0), mode="drop")
            stamps = (frames_buf, durs_buf, logps_buf)
        n = n + emit.astype(jnp.int32)

        u_count = jnp.where(advance > 0, 0, u_count + 1)
        time_idx = time_idx + advance
        # g changed on emit -> the cached per-step argmax vectors are stale
        return (time_idx, u_count, new_dstate, tokens, n, emit,
                tok_vec, dur_vec, conf_vec, stamps, aux)

    tokens0 = jnp.full((max_tokens,), -1, jnp.int32)
    if trace:
        aux0 = (jnp.full((enc.shape[0] * max_symbols, 7), -1, jnp.int32),
                jnp.zeros((), jnp.int32))
    else:
        aux0 = ()
    stamps0 = ((jnp.full((max_tokens,), -1, jnp.int32),
                jnp.full((max_tokens,), -1, jnp.int32),
                jnp.zeros((max_tokens,), jnp.float32))
               if with_timestamps else ())
    init = (state.time_carry[0].astype(jnp.int32), jnp.zeros((), jnp.int32),
            state, tokens0, jnp.zeros((), jnp.int32), jnp.asarray(True),
            jnp.zeros((tq,), jnp.int32), jnp.zeros((tq,), jnp.int32),
            jnp.zeros((tq,), jnp.float32), stamps0, aux0)
    time_final, _, final_state, tokens, n, _, _, _, _, stamps, aux = lax.while_loop(
        cond, body, init)
    carry = jnp.maximum(time_final - t_enc, 0).astype(jnp.int32)
    final_state = final_state._replace(time_carry=jnp.full_like(state.time_carry, carry))
    out = (tokens, n, final_state)
    if with_timestamps:
        out = out + (stamps,)
    if trace:
        out = out + (aux,)
    return out
