"""Batched multi-stream TDT greedy decode.

M5 of the build plan (SURVEY §7): per-stream cache state stacked on the
batch axis; one lockstep ``lax.while_loop`` decodes all streams, per-stream
masks handle divergent emission counts and time advances ("mask-and-
continue" — hard part #3). The predictor LSTM runs batched every iteration
and results are selected per-stream; on the MXU a [B, ...] matmul costs the
same as [1, ...], so lockstep batching trades wasted lanes for an 8x+
throughput win over the reference's one-session-per-stream design (which
had no batching at all: B=1 everywhere, SURVEY §2.5).

The batch axis is dp-shardable: all ops are elementwise or batched-matmul
over B, so under a mesh the loop runs fully parallel with zero cross-chip
collectives.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode.tdt_greedy import DecodeState
from trt_asr_tpu.models.parakeet.joint import joint_from_projected, joint_project_enc
from trt_asr_tpu.models.parakeet.predictor import predictor_step


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_tokens", "max_symbols", "use_punct_mask",
                     "blank_penalty", "use_pallas_joint", "pallas_interpret",
                     "with_timestamps"),
)
def tdt_greedy_decode_batch(
    params: Dict[str, Any],
    cfg: ModelConfig,
    enc: jnp.ndarray,              # [B, T, D]
    t_enc: jnp.ndarray,            # [B] int32 valid steps
    state: DecodeState,            # batch B
    *,
    max_tokens: int,
    max_symbols: Optional[int] = None,
    blank_penalty: float = 0.0,
    emitted_so_far: Optional[jnp.ndarray] = None,   # [B]
    punct_mask: Optional[jnp.ndarray] = None,
    use_punct_mask: bool = False,
    use_pallas_joint: bool = False,
    pallas_interpret=None,
    with_timestamps: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, DecodeState]:
    """Returns (tokens [B, max_tokens] (-1 padded), n [B], new_state).

    with_timestamps=True appends ``(frames, durs, logps)``
    [B, max_tokens] (int32/-1, int32/-1, f32/0 padded): per emitted token,
    the within-chunk encoder frame it was emitted at, its predicted TDT
    duration, and its decode-time log-softmax confidence (see
    tdt_greedy.py)."""
    b = enc.shape[0]
    max_symbols = max_symbols or cfg.max_symbols_per_timestep
    blank = cfg.blank_id
    ths = cfg.token_head_size
    dur_values = jnp.asarray(cfg.duration_values, jnp.int32)
    if emitted_so_far is None:
        emitted_so_far = jnp.zeros((b,), jnp.int32)

    enc_proj = joint_project_enc(params["joint"], enc)            # [B, T, J]
    tq = enc_proj.shape[1]
    bi = jnp.arange(b)
    # Two regimes (static switch at trace):
    # - small B*T (streaming chunks): blank-run batching — precompute every
    #   (row, step) argmax under the current g, recompute only when some g
    #   changed. A recompute costs one 10 MB weight read, same as ONE
    #   per-step joint, so it wins whenever emissions are rarer than steps.
    # - large B*T (offline batches): with ~B emissions per iteration the
    #   [B,T,V] recompute fires every iteration and is pure compute waste
    #   (84 GFLOP/recompute at B=64 x 10 s). Each row only ever reads its
    #   CURRENT time position, so compute exactly that: a [B,V] joint per
    #   iteration (0.67 GFLOP) — ~100x less decode compute.
    blank_run = b * tq <= 256
    # the fused joint kernel is a LATENCY device: all rows + the 10 MB out
    # projection + [rows, V] f32 logits must fit VMEM at once. Budget:
    # bf16 wo 10.6 MB + wp + logits rows*33 KB -> 128 rows is the safe cap
    # (192 rows measured 0.8 MB over the 16 MB scoped limit). Above it,
    # XLA's own matmul tiling is the right engine — gate statically.
    use_pallas_joint = use_pallas_joint and b * tq <= 128
    if use_pallas_joint:
        from trt_asr_tpu.ops.pallas.joint_step_kernel import (
            joint_step_pallas_prepadded, pad_joint_weights)

        padded_w = pad_joint_weights(params["joint"])

    def compute_vecs(g, n):
        """Blank-run batching (see tdt_greedy.py module docstring): the
        argmax token/duration of EVERY (row, step) under each row's current
        g in one fused matmul. One recompute costs the same HBM traffic as
        one per-step iteration (both read the 10 MB out-projection once),
        so recomputing ALL rows whenever ANY row's g changed is exact
        (idempotent for unchanged rows) and strictly cheaper than stepping."""
        if use_pallas_joint:
            g_rows = jnp.repeat(g, tq, axis=0)                     # [B*T, P]
            toks, dur_sel, logits_full = joint_step_pallas_prepadded(
                enc_proj.reshape(b * tq, -1), g_rows, *padded_w, ths=ths,
                ndur=cfg.num_duration_bins, blank_id=blank,
                blank_penalty=blank_penalty, interpret=pallas_interpret)
            toks = toks.reshape(b, tq)
            dur_sel = dur_sel.reshape(b, tq)
            tok_logits = logits_full[:, :ths].reshape(b, tq, ths)
            if blank_penalty:
                tok_logits = tok_logits.at[..., blank].add(-blank_penalty)
        else:
            logits = joint_apply_projected(enc_proj, g)            # [B, T, V]
            tok_logits = logits[..., :ths]
            if blank_penalty:
                tok_logits = tok_logits.at[..., blank].add(-blank_penalty)
            dur_logits = logits[..., ths : ths + cfg.num_duration_bins]
            toks = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
            dur_sel = jnp.argmax(dur_logits, axis=-1)
        if use_punct_mask and punct_mask is not None:
            first = ((emitted_so_far + n) == 0)[:, None]
            toks = jnp.where(first & punct_mask[toks], blank, toks)
        if with_timestamps:
            conf = (jnp.take_along_axis(tok_logits, toks[..., None], axis=-1)[..., 0]
                    - jax.nn.logsumexp(tok_logits, axis=-1)).astype(jnp.float32)
        else:
            conf = jnp.zeros((b, tq), jnp.float32)
        return toks, dur_values[dur_sel].astype(jnp.int32), conf

    def joint_apply_projected(e_proj, g):
        from trt_asr_tpu.models.parakeet.joint import _proj

        h = jnp.maximum(e_proj + _proj(params["joint"]["pred"], g)[:, None, :], 0)
        return _proj(params["joint"]["out"], h)

    def step_vals(g, n, t_c):
        """Per-iteration joint at each row's CURRENT position only [B, V]."""
        e_t = enc_proj[bi, t_c]                                    # [B, J]
        from trt_asr_tpu.models.parakeet.joint import _proj

        h = jnp.maximum(e_t + _proj(params["joint"]["pred"], g), 0)
        logits = _proj(params["joint"]["out"], h)                  # [B, V]
        tok_logits = logits[:, :ths]
        if blank_penalty:
            tok_logits = tok_logits.at[:, blank].add(-blank_penalty)
        toks = jnp.argmax(tok_logits, axis=-1).astype(jnp.int32)
        dur_sel = jnp.argmax(logits[:, ths : ths + cfg.num_duration_bins], axis=-1)
        if use_punct_mask and punct_mask is not None:
            first = (emitted_so_far + n) == 0
            toks = jnp.where(first & punct_mask[toks], blank, toks)
        if with_timestamps:
            conf = (jnp.take_along_axis(tok_logits, toks[:, None], axis=1)[:, 0]
                    - jax.nn.logsumexp(tok_logits, axis=1)).astype(jnp.float32)
        else:
            conf = jnp.zeros((b,), jnp.float32)
        return toks, dur_values[dur_sel].astype(jnp.int32), conf

    def cond(carry):
        time_idx = carry[0]
        return jnp.any(time_idx < t_enc)

    def body(carry):
        (time_idx, u_count, dstate, tokens, n, any_stale, tok_vec, dur_vec,
         conf_vec, stamps) = carry
        t_c = jnp.clip(time_idx, 0, tq - 1)
        if blank_run:
            tok_vec, dur_vec, conf_vec = lax.cond(
                any_stale, lambda _: compute_vecs(dstate.g, n),
                lambda _: (tok_vec, dur_vec, conf_vec), None)
            best_tok = tok_vec[bi, t_c]
            duration = dur_vec[bi, t_c]
            conf = conf_vec[bi, t_c]
        else:
            best_tok, duration, conf = step_vals(dstate.g, n, t_c)
        active = time_idx < t_enc
        is_blank = best_tok == blank
        advance = jnp.where(is_blank & (duration == 0), 1, duration)
        hit_cap = u_count >= (max_symbols - 1)
        advance = jnp.where((advance == 0) & hit_cap, 1, advance)

        emit = active & (~is_blank) & (n < max_tokens)
        # batched predictor step for all streams; select per-stream
        y_in = jnp.where(emit, best_tok, dstate.y_id)
        g2, h2, c2 = predictor_step(params["predictor"], y_in, dstate.h, dstate.c)
        sel = emit[:, None]
        new_dstate = DecodeState(
            g=jnp.where(sel, g2, dstate.g),
            h=jnp.where(sel[None], h2, dstate.h),
            c=jnp.where(sel[None], c2, dstate.c),
            y_id=jnp.where(emit, best_tok, dstate.y_id),
            time_carry=dstate.time_carry,
        )
        tokens = tokens.at[bi, jnp.where(emit, n, max_tokens)].set(
            jnp.where(emit, best_tok, -1), mode="drop")
        if with_timestamps:
            frames_buf, durs_buf, logps_buf = stamps
            idx = jnp.where(emit, n, max_tokens)
            frames_buf = frames_buf.at[bi, idx].set(
                jnp.where(emit, t_c, -1), mode="drop")
            durs_buf = durs_buf.at[bi, idx].set(
                jnp.where(emit, duration.astype(jnp.int32), -1), mode="drop")
            logps_buf = logps_buf.at[bi, idx].set(
                jnp.where(emit, conf, 0.0), mode="drop")
            stamps = (frames_buf, durs_buf, logps_buf)
        n = n + emit.astype(jnp.int32)

        u_count = jnp.where(advance > 0, 0, u_count + 1)
        time_idx = time_idx + jnp.where(active, advance, 0)
        return (time_idx, u_count, new_dstate, tokens, n, jnp.any(emit),
                tok_vec, dur_vec, conf_vec, stamps)

    tokens0 = jnp.full((b, max_tokens), -1, jnp.int32)
    stamps0 = ((jnp.full((b, max_tokens), -1, jnp.int32),
                jnp.full((b, max_tokens), -1, jnp.int32),
                jnp.zeros((b, max_tokens), jnp.float32))
               if with_timestamps else ())
    init = (state.time_carry.astype(jnp.int32), jnp.zeros((b,), jnp.int32),
            state, tokens0, jnp.zeros((b,), jnp.int32), jnp.asarray(True),
            jnp.zeros((b, tq), jnp.int32), jnp.zeros((b, tq), jnp.int32),
            jnp.zeros((b, tq), jnp.float32), stamps0)
    time_final, _, final_state, tokens, n, _, _, _, _, stamps = lax.while_loop(
        cond, body, init)
    carry = jnp.maximum(time_final - t_enc, 0).astype(jnp.int32)
    final_state = final_state._replace(time_carry=carry)
    if with_timestamps:
        return tokens, n, final_state, stamps
    return tokens, n, final_state


def reset_decode_state_rows(params, cfg: ModelConfig, state: DecodeState,
                            row_mask: jnp.ndarray, prompt_ids) -> DecodeState:
    """Re-initialize (and re-prime) the decode state of selected streams —
    stream add/remove in a batched server."""
    from trt_asr_tpu.decode.tdt_greedy import init_decode_state, prime_decode_state

    fresh = prime_decode_state(params, cfg, init_decode_state(cfg, state.g.shape[0]),
                               prompt_ids)
    m1 = row_mask[:, None]
    return DecodeState(
        g=jnp.where(m1, fresh.g, state.g),
        h=jnp.where(m1[None], fresh.h, state.h),
        c=jnp.where(m1[None], fresh.c, state.c),
        y_id=jnp.where(row_mask, fresh.y_id, state.y_id),
        time_carry=jnp.where(row_mask, 0, state.time_carry),
    )
