"""Device-resident TDT beam search — the beam frontier inside one jitted
program per chunk.

The host beam (decode/beam.py) is the semantics oracle: it round-trips the
frontier's joint logits to the host every step
(beam.py:191-199), the very host-sync antipattern the reference's greedy
loop was faulted for (cpp/src/parakeet_trt.cpp:2914-3713, SURVEY §3.2) and
that decode/tdt_greedy.py already eliminated for greedy. This module moves
the ENTIRE search on device: a static-width hypothesis set (scores, token
buffers, cursors, y_id, predictor h/c/g stacked on a beam axis) advanced
frame-by-frame inside ``lax.scan``, with candidate expansion, path
recombination (log-add merging), and label-diverse pruning all executed as
masked tensor ops. The host receives one bounded state per chunk.

Exactness contract (tests/test_beam_device.py):
- beam=1 reproduces the greedy decoder token-for-token (the same special
  case the host beam anchors to);
- beam>1 reproduces the HOST beam's n-best — token sequences, ranking and
  emission stamps — per random seed, offline and across streaming chunk
  boundaries (waiting hypotheses, cross-chunk duration jumps).

Algorithm identity with the host (beam.py beam_advance), per frame t:
1. actives with cursor != t wait (pool slots, untouched);
2. actives at t expand through ``max_symbols`` rounds of dur-0 chaining:
   per hypothesis the candidate set is [blank @ argmax-duration] ++
   [top-k non-blank x every duration bin], leading-punct tokens masked on
   a true first emission; advancing candidates are appended to the pool
   in the host's exact order (hyp-major, candidate-minor, round-major),
   dur-0 candidates form the next frontier, pruned to the beam width by
   stable score order; the last round forces advance >= 1;
3. pool entries with identical (token history, cursor) merge by log-add,
   first occurrence is the representative, the dominant alignment's
   stamps win;
4. label-diverse pruning: best entry per distinct label first (in stable
   score order, up to beam), remaining slots filled by raw score.

The merge needs FULL token-history equality over ~700 pool entries. A
naive [P, P, L] elementwise compare would materialize hundreds of MB at
full size; instead histories are compared exactly via two Gram matmuls:
tokens+1 are split into 7-bit halves (hi = v >> 7 <= 64, lo = v & 127),
and ||a - b||^2 == 0 is evaluated per half in f32 (max sum-of-squares
512 * 127^2 = 8.3e6 < 2^24, so the arithmetic is integer-exact) — history
equality becomes (len equal) & (hi distance 0) & (lo distance 0), two
[P, L] @ [L, P] matmuls that ride the MXU.

Shallow fusion runs on device too: the framework's concrete lm_fn
families — the stupid-backoff n-gram LM and the contextual-biasing trie —
compile into sorted-key tensor tables (decode/lm_device.py) scored inside
the expansion with the host's exact semantics (acoustic-only top-k
selection, ``lm_weight * lm_fn(prefix, v)`` added to every non-blank
candidate, decode/beam.py:231-238). Only a truly arbitrary host callable
still requires the host beam; the other host-only limit is unbounded
token counts (the device buffers hold ``token_cap`` tokens per
hypothesis).

token_cap overflow semantics (VERDICT r4 #4): a non-blank emission into a
full buffer is a HEAD-PRESERVING TRUNCATION — the first ``token_cap``
tokens stay intact, the new token is dropped, and the hypothesis's
``sat`` flag latches True (propagated to every descendant and OR-merged
through recombination). Scores and predictor state still advance, so the
ranking stays the search's, but the transcript tail and the
history-equality merge are no longer trustworthy past the cap.
``BeamStreamingSession`` surfaces a live saturated hypothesis once per
utterance as an ERROR event and keeps streaming (tests/
test_beam_device.py::test_token_cap_saturation_*); pick a larger
``token_cap`` (512 default ~ an hour of speech per utterance at normal
emission rates) or the host beam for unbounded transcripts.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.joint import joint_from_projected, joint_project_enc
from trt_asr_tpu.models.parakeet.predictor import predictor_step

NEG = -jnp.inf


class BeamDeviceState(NamedTuple):
    """The carried search state. All leading axes are the static beam
    width K; ``tokens``/``frames``/``durs``/``logps`` are [K, L] utterance
    buffers (-1 / 0 padded). ``cursor`` is relative to the next chunk's
    first frame (the host oracle's global offset, rebased per chunk).
    ``frame_base`` is the global index of that frame (for stamps);
    ``emitted_base`` mirrors BeamSearchState.emitted_base."""

    score: jnp.ndarray      # [K] f32, -inf = dead slot
    tokens: jnp.ndarray     # [K, L] int32, -1 padded
    n_tok: jnp.ndarray      # [K] int32
    cursor: jnp.ndarray     # [K] int32
    y_id: jnp.ndarray       # [K] int32
    g: jnp.ndarray          # [K, P]
    h: jnp.ndarray          # [R, K, P]
    c: jnp.ndarray          # [R, K, P]
    frames: jnp.ndarray     # [K, L] int32 emission frame per token
    durs: jnp.ndarray       # [K, L] int32 predicted duration per token
    logps: jnp.ndarray      # [K, L] f32 token log-softmax per token
    frame_base: jnp.ndarray   # scalar int32
    emitted_base: jnp.ndarray  # scalar int32
    sat: jnp.ndarray        # [K] bool: token_cap overflow (truncated tail)


def init_beam_device_state(cfg: ModelConfig, dec_state, *, beam: int,
                           token_cap: int = 512,
                           emitted_so_far: int = 0) -> BeamDeviceState:
    """Fresh search from a prompt-primed DecodeState (B=1): slot 0 live at
    score 0, the rest dead — the device analog of beam_start."""
    K, L = beam, token_cap
    P = cfg.pred_hidden
    R = cfg.pred_rnn_layers
    score = jnp.full((K,), NEG, jnp.float32).at[0].set(0.0)
    return BeamDeviceState(
        score=score,
        tokens=jnp.full((K, L), -1, jnp.int32),
        n_tok=jnp.zeros((K,), jnp.int32),
        cursor=jnp.zeros((K,), jnp.int32),
        y_id=jnp.broadcast_to(dec_state.y_id[0], (K,)).astype(jnp.int32),
        g=jnp.broadcast_to(dec_state.g[0], (K, P)).astype(jnp.float32),
        h=jnp.broadcast_to(dec_state.h[:, 0:1], (R, K, P)).astype(jnp.float32),
        c=jnp.broadcast_to(dec_state.c[:, 0:1], (R, K, P)).astype(jnp.float32),
        frames=jnp.full((K, L), -1, jnp.int32),
        durs=jnp.full((K, L), -1, jnp.int32),
        logps=jnp.zeros((K, L), jnp.float32),
        frame_base=jnp.zeros((), jnp.int32),
        emitted_base=jnp.full((), emitted_so_far, jnp.int32),
        sat=jnp.zeros((K,), jnp.bool_),
    )


def _history_eq(tokens_a, n_a, tokens_b, n_b):
    """[Pa, L] x [Pb, L] -> [Pa, Pb] exact full-history equality via the
    split-precision Gram trick (module docstring). Pads are -1 on both
    sides, so equal lengths + equal squared distance <=> equal buffers."""
    va = (tokens_a + 1).astype(jnp.float32)    # 0..8194
    vb = (tokens_b + 1).astype(jnp.float32)
    eq = n_a[:, None] == n_b[None, :]
    hi_a, lo_a = jnp.floor_divide(va, 128.0), jnp.mod(va, 128.0)
    hi_b, lo_b = jnp.floor_divide(vb, 128.0), jnp.mod(vb, 128.0)
    for a, b in ((hi_a, hi_b), (lo_a, lo_b)):
        sa = jnp.sum(a * a, axis=1)
        sb = jnp.sum(b * b, axis=1)
        # f32 matmul must be exact here: force highest precision regardless
        # of the global TRT_ASR_F32_PRECISION mode
        gram = jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        d2 = sa[:, None] + sb[None, :] - 2.0 * gram
        eq = eq & (d2 == 0.0)
    return eq


def _stable_desc(score):
    """Stable descending argsort (ties keep original index order) — the
    device analog of python sorted(reverse=True)."""
    return jnp.argsort(-score, stable=True)


def _beam_chunk_core(
    params: Dict[str, Any],
    cfg: ModelConfig,
    enc: jnp.ndarray,            # [T, D] encoder output rows (padded ok)
    t_enc: jnp.ndarray,          # scalar int32 valid rows
    state: BeamDeviceState,
    *,
    beam: int,
    expansion_k: int = 4,
    max_symbols: Optional[int] = None,
    blank_penalty: float = 0.0,
    punct_mask: Optional[jnp.ndarray] = None,
    use_punct_mask: bool = False,
    lm_spec=None,                # lm_device.LMSpec (static) — with
    lm_tables=None,              # lm_device.LMTables (traced arrays):
                                 # device shallow fusion / biasing
    lm_weight: float = 0.0,
) -> BeamDeviceState:
    """Advance the device beam over one chunk's encoder frames. Returns the
    carried state with cursors rebased past the consumed frames — the
    device analog of beam_advance (decode/beam.py:137-306). Undecorated
    core: jitted as ``tdt_beam_chunk_device`` (single stream) and vmapped
    over a stream axis as ``tdt_beam_chunk_device_batch``."""
    K = beam
    k = expansion_k if beam > 1 else 1
    ms = max_symbols or cfg.max_symbols_per_timestep
    nd = cfg.num_duration_bins
    C = 1 + k * nd if beam > 1 else 1        # candidates per hyp per round
    L = state.tokens.shape[1]
    P = cfg.pred_hidden
    R = cfg.pred_rnn_layers
    blank = cfg.blank_id
    ths = cfg.token_head_size
    dur_values = jnp.asarray(cfg.duration_values, jnp.int32)

    enc_proj = joint_project_enc(params["joint"], enc[None])[0]   # [T, J]
    T = enc_proj.shape[0]
    # candidate slot -> top-k index / duration bin (beam>1 layout:
    # slot 0 = blank@bestdur, slot 1+m*nd+di = (token m, duration di))
    if beam > 1:
        mm = np.zeros(C, np.int32)
        dd = np.zeros(C, np.int32)
        for m in range(k):
            for di in range(nd):
                mm[1 + m * nd + di] = m
                dd[1 + m * nd + di] = di
        mm = jnp.asarray(mm)
        dd = jnp.asarray(dd)

    def expand_round(frontier, r, t, enc_row):
        """One dur-0 chain round: returns (next_frontier, pool_block)."""
        (f_score, f_tok, f_n, f_y, f_g, f_h, f_c,
         f_frames, f_durs, f_logps, f_alive, f_sat) = frontier
        logits = joint_from_projected(
            params["joint"], jnp.broadcast_to(enc_row, (K, enc_row.shape[0])),
            f_g)                                             # [K, V]
        tok_logits = logits[:, :ths]
        if blank_penalty:
            tok_logits = tok_logits.at[:, blank].add(-blank_penalty)
        ls_tok = jax.nn.log_softmax(tok_logits, axis=1)
        ls_dur = jax.nn.log_softmax(
            lax.dynamic_slice_in_dim(logits, ths, nd, axis=1), axis=1)
        first = (state.emitted_base == 0) & (f_n == 0)       # [K]
        best_dur_bin = jnp.argmax(ls_dur, axis=1).astype(jnp.int32)

        if beam == 1:
            # exact greedy successor (host beam.py:210-216)
            v = jnp.argmax(ls_tok, axis=1).astype(jnp.int32)
            if use_punct_mask and punct_mask is not None:
                v = jnp.where(first & (v != blank) & punct_mask[v], blank, v)
            cand_tok = v[:, None]                            # [K, 1]
            cand_di = best_dur_bin[:, None]
            step_tokens = v                                  # [K] (k=1)
        else:
            masked = ls_tok.at[:, blank].set(NEG)
            if use_punct_mask and punct_mask is not None:
                masked = jnp.where(first[:, None] & punct_mask[None, :ths],
                                   NEG, masked)
            _, top_idx = lax.top_k(masked, k)                # [K, k]
            top_idx = top_idx.astype(jnp.int32)
            cand_tok = jnp.concatenate(
                [jnp.full((K, 1), blank, jnp.int32), top_idx[:, mm[1:]]],
                axis=1)                                      # [K, C]
            cand_di = jnp.concatenate(
                [best_dur_bin[:, None], jnp.broadcast_to(dd[1:], (K, C - 1))],
                axis=1)
            step_tokens = top_idx.reshape(-1)                # [K*k]

        cand_dur = dur_values[cand_di]                       # [K, C]
        is_blank = cand_tok == blank
        forced = r == ms - 1
        adv = jnp.where(is_blank, jnp.maximum(cand_dur, 1),
                        jnp.where(forced, jnp.maximum(cand_dur, 1), cand_dur))
        ls_tok_c = jnp.take_along_axis(ls_tok, cand_tok, axis=1)
        ls_dur_c = jnp.take_along_axis(ls_dur, cand_di, axis=1)
        c_score = jnp.where(f_alive[:, None],
                            f_score[:, None] + ls_tok_c + ls_dur_c, NEG)
        if beam > 1 and lm_spec is not None and lm_weight:
            # host semantics (beam.py:231-238): candidates are chosen by
            # acoustic score alone; the fused LM term reweights every
            # non-blank candidate's path score before pruning/merging
            from trt_asr_tpu.decode.lm_device import lm_scores

            lmv = lm_weight * lm_scores(lm_spec, lm_tables, f_tok, f_n,
                                        top_idx)              # [K, k]
            c_score = c_score + jnp.concatenate(
                [jnp.zeros((K, 1), jnp.float32), lmv[:, mm[1:]]], axis=1)

        # ONE predictor step per distinct (hyp, token) (host g_cache)
        if beam == 1:
            y_step = step_tokens                             # [K]
            h_in, c_in = f_h, f_c
        else:
            y_step = step_tokens                             # [K*k]
            h_in = jnp.repeat(f_h, k, axis=1)
            c_in = jnp.repeat(f_c, k, axis=1)
        g2, h2, c2 = predictor_step(params["predictor"], y_step, h_in, c_in)
        g2 = g2.reshape(K, k, P)
        h2 = h2.reshape(R, K, k, P)
        c2 = c2.reshape(R, K, k, P)
        if beam == 1:
            g_sel, h_sel, c_sel = g2[:, 0:1], h2[:, :, 0:1], c2[:, :, 0:1]
        else:
            g_sel = jnp.concatenate([g2[:, 0:1], g2[:, mm[1:]]], axis=1)
            h_sel = jnp.concatenate([h2[:, :, 0:1], h2[:, :, mm[1:]]], axis=2)
            c_sel = jnp.concatenate([c2[:, :, 0:1], c2[:, :, mm[1:]]], axis=2)

        emit = ~is_blank                                     # [K, C]
        can_write = emit & (f_n[:, None] < L)
        # head-preserving truncation: an emission with a full buffer drops
        # the token and latches the descendant's saturation flag
        c_sat = f_sat[:, None] | (emit & (f_n[:, None] >= L))   # [K, C]
        at_n = jnp.arange(L)[None, None, :] == f_n[:, None, None]
        wr = can_write[:, :, None] & at_n
        tok_b = jnp.broadcast_to(f_tok[:, None, :], (K, C, L))
        c_tokens = jnp.where(wr, cand_tok[:, :, None], tok_b)
        c_frames = jnp.where(
            wr, (state.frame_base + t)[None, None, None],
            jnp.broadcast_to(f_frames[:, None, :], (K, C, L)))
        c_durs = jnp.where(wr, cand_dur[:, :, None],
                           jnp.broadcast_to(f_durs[:, None, :], (K, C, L)))
        c_logps = jnp.where(wr, ls_tok_c[:, :, None],
                            jnp.broadcast_to(f_logps[:, None, :], (K, C, L)))
        c_n = f_n[:, None] + can_write.astype(jnp.int32)
        c_y = jnp.where(is_blank, f_y[:, None], cand_tok)
        c_g = jnp.where(is_blank[:, :, None], f_g[:, None, :], g_sel)
        c_h = jnp.where(is_blank[None, :, :, None], f_h[:, :, None, :], h_sel)
        c_c = jnp.where(is_blank[None, :, :, None], f_c[:, :, None, :], c_sel)
        c_cursor = t + adv

        pool_valid = f_alive[:, None] & (adv > 0)
        front_valid = f_alive[:, None] & (adv == 0) & ~is_blank

        flat = lambda x: x.reshape((K * C,) + x.shape[2:])   # noqa: E731
        block = dict(
            score=jnp.where(flat(pool_valid), flat(c_score), NEG),
            tokens=flat(c_tokens), n_tok=flat(c_n),
            cursor=flat(c_cursor), y_id=flat(c_y), g=flat(c_g),
            h=c_h.reshape(R, K * C, P), c=c_c.reshape(R, K * C, P),
            frames=flat(c_frames), durs=flat(c_durs), logps=flat(c_logps),
            sat=flat(c_sat),
        )

        # next frontier: dur-0 candidates, stable score order, top K
        f_flat_score = jnp.where(flat(front_valid), flat(c_score), NEG)
        order = _stable_desc(f_flat_score)[:K]
        sel = lambda x: x[order]                             # noqa: E731
        nf = (sel(f_flat_score), sel(flat(c_tokens)), sel(flat(c_n)),
              sel(flat(c_y)), sel(flat(c_g)),
              block["h"][:, order], block["c"][:, order],
              sel(flat(c_frames)), sel(flat(c_durs)), sel(flat(c_logps)),
              sel(f_flat_score) > NEG, sel(flat(c_sat)))
        return nf, block

    def frame_body(carry_state, t_and_row):
        t, enc_row = t_and_row
        st = carry_state
        alive = st.score > NEG
        here = alive & (st.cursor == t)

        def process(st):
            waiting = alive & (st.cursor != t)
            frontier0 = (jnp.where(here, st.score, NEG), st.tokens, st.n_tok,
                         st.y_id, st.g, st.h, st.c,
                         st.frames, st.durs, st.logps, here, st.sat)

            def round_step(frontier, r):
                nf, block = expand_round(frontier, r, t, enc_row)
                return nf, block

            _, blocks = lax.scan(round_step, frontier0, jnp.arange(ms))
            # pool = waiting actives ++ round blocks (host insertion order)
            Pn = K + ms * K * C
            cat = lambda w, b: jnp.concatenate(                # noqa: E731
                [w, b.reshape((ms * K * C,) + b.shape[2:])], axis=0)
            p_score = cat(jnp.where(waiting, st.score, NEG), blocks["score"])
            p_tokens = cat(st.tokens, blocks["tokens"])
            p_n = cat(st.n_tok, blocks["n_tok"])
            p_cursor = cat(st.cursor, blocks["cursor"])
            p_y = cat(st.y_id, blocks["y_id"])
            p_g = cat(st.g, blocks["g"])
            p_h = jnp.concatenate(
                [st.h, blocks["h"].transpose(1, 0, 2, 3).reshape(R, -1, P)],
                axis=1)
            p_c = jnp.concatenate(
                [st.c, blocks["c"].transpose(1, 0, 2, 3).reshape(R, -1, P)],
                axis=1)
            p_frames = cat(st.frames, blocks["frames"])
            p_durs = cat(st.durs, blocks["durs"])
            p_logps = cat(st.logps, blocks["logps"])
            p_sat = cat(st.sat, blocks["sat"])

            valid = p_score > NEG
            hist_eq = _history_eq(p_tokens, p_n, p_tokens, p_n)
            eq = (hist_eq & (p_cursor[:, None] == p_cursor[None, :])
                  & valid[:, None] & valid[None, :])
            idx = jnp.arange(Pn)
            rep = jnp.min(jnp.where(eq, idx[None, :], Pn), axis=1)
            is_rep = (rep == idx) & valid
            # log-add merge (guarded logsumexp over each class row)
            masked = jnp.where(eq, p_score[None, :], NEG)
            mrow = jnp.max(masked, axis=1)
            safe = jnp.where(jnp.isfinite(mrow), mrow, 0.0)
            merged = safe + jnp.log(
                jnp.sum(jnp.exp(masked - safe[:, None]), axis=1))
            m_score = jnp.where(is_rep, merged, NEG)
            # dominant alignment's stamps (host best_ind bookkeeping)
            dom = jnp.argmax(masked, axis=1)
            m_frames = p_frames[dom]
            m_durs = p_durs[dom]
            m_logps = p_logps[dom]
            # saturation is sticky through recombination: a truncated
            # buffer may spuriously merge, so the class inherits any flag
            m_sat = jnp.any(eq & p_sat[None, :], axis=1)

            # label-diverse pruning in stable merged-score order
            order = _stable_desc(m_score)
            s_score = m_score[order]
            s_valid = s_score > NEG
            eqL = (hist_eq[order][:, order]
                   & s_valid[:, None] & s_valid[None, :])
            dup = jnp.any(eqL & (idx[None, :] < idx[:, None]), axis=1)
            is_first = s_valid & ~dup
            n_first_cum = jnp.cumsum(is_first.astype(jnp.int32))
            pick_first = is_first & (n_first_cum <= K)
            n_first = jnp.minimum(n_first_cum[-1], K)
            rest = s_valid & ~pick_first
            rest_cum = jnp.cumsum(rest.astype(jnp.int32))
            pick_rest = rest & (rest_cum <= K - n_first)
            slot = jnp.where(
                pick_first, n_first_cum - 1,
                jnp.where(pick_rest, n_first + rest_cum - 1, K))
            # survivor slot -> sorted position -> pool index
            pos_of_slot = jnp.full((K,), Pn, jnp.int32).at[slot].set(
                idx.astype(jnp.int32), mode="drop")
            pool_of_slot = jnp.where(pos_of_slot < Pn,
                                     order[jnp.minimum(pos_of_slot, Pn - 1)],
                                     0)
            live = pos_of_slot < Pn
            gk = lambda x: x[pool_of_slot]                   # noqa: E731
            return BeamDeviceState(
                score=jnp.where(live, m_score[pool_of_slot], NEG),
                tokens=gk(p_tokens), n_tok=gk(p_n), cursor=gk(p_cursor),
                y_id=gk(p_y), g=gk(p_g), h=p_h[:, pool_of_slot],
                c=p_c[:, pool_of_slot], frames=gk(m_frames),
                durs=gk(m_durs), logps=gk(m_logps),
                frame_base=st.frame_base, emitted_base=st.emitted_base,
                sat=jnp.where(live, gk(m_sat), False))

        new_st = lax.cond((t < t_enc) & jnp.any(here), process,
                          lambda s: s, st)
        return new_st, ()

    ts = jnp.arange(T)
    final, _ = lax.scan(frame_body, state, (ts, enc_proj))
    return final._replace(
        cursor=final.cursor - t_enc.astype(jnp.int32),
        frame_base=final.frame_base + t_enc.astype(jnp.int32))


_BEAM_CHUNK_STATIC = ("cfg", "beam", "expansion_k", "max_symbols",
                      "blank_penalty", "use_punct_mask", "lm_spec",
                      "lm_weight")

tdt_beam_chunk_device = functools.partial(
    jax.jit, static_argnames=_BEAM_CHUNK_STATIC)(_beam_chunk_core)


@functools.partial(jax.jit, static_argnames=_BEAM_CHUNK_STATIC)
def tdt_beam_chunk_device_batch(
    params: Dict[str, Any],
    cfg: ModelConfig,
    enc: jnp.ndarray,            # [S, T, D] encoder rows per stream
    t_enc: jnp.ndarray,          # [S] int32 valid rows per stream
    state: BeamDeviceState,      # [S, K, ...] leaves (init_..._batch)
    *,
    beam: int,
    expansion_k: int = 4,
    max_symbols: Optional[int] = None,
    blank_penalty: float = 0.0,
    punct_mask: Optional[jnp.ndarray] = None,
    use_punct_mask: bool = False,
    lm_spec=None,
    lm_tables=None,
    lm_weight: float = 0.0,
) -> BeamDeviceState:
    """S independent device beams advanced in lockstep — the frontier's K
    axis stacked alongside the stream axis (VERDICT r4 #3), so the batch
    engine can serve beam(+LM) per slot in ONE program. Exactly vmap of
    the single-stream core: params / punct mask / LM tables broadcast,
    per-stream enc, valid length and state mapped. A slot with t_enc == 0
    is a provable no-op on its rows (every frame fails ``t < t_enc``), the
    beam analog of the greedy engine's mask-and-skip contract."""
    core = functools.partial(
        _beam_chunk_core, beam=beam, expansion_k=expansion_k,
        max_symbols=max_symbols, blank_penalty=blank_penalty,
        use_punct_mask=use_punct_mask, lm_spec=lm_spec, lm_weight=lm_weight)
    return jax.vmap(
        lambda e, t, s: core(params, cfg, e, t, s, punct_mask=punct_mask,
                             lm_tables=lm_tables))(enc, t_enc, state)


def init_beam_device_state_batch(cfg: ModelConfig, dec_state, *, beam: int,
                                 token_cap: int = 512) -> BeamDeviceState:
    """[S, K, ...] batched search state: every stream row primed from its
    DecodeState row (prompt-primed g/h/c/y_id), slot 0 live at score 0."""
    K, L = beam, token_cap
    P = cfg.pred_hidden
    R = cfg.pred_rnn_layers
    S = dec_state.g.shape[0]
    score = jnp.broadcast_to(
        jnp.full((K,), NEG, jnp.float32).at[0].set(0.0), (S, K))
    return BeamDeviceState(
        score=score,
        tokens=jnp.full((S, K, L), -1, jnp.int32),
        n_tok=jnp.zeros((S, K), jnp.int32),
        cursor=jnp.zeros((S, K), jnp.int32),
        y_id=jnp.broadcast_to(dec_state.y_id[:, None], (S, K)).astype(jnp.int32),
        g=jnp.broadcast_to(dec_state.g[:, None, :], (S, K, P)).astype(jnp.float32),
        h=jnp.broadcast_to(dec_state.h.transpose(1, 0, 2)[:, :, None, :],
                           (S, R, K, P)).astype(jnp.float32),
        c=jnp.broadcast_to(dec_state.c.transpose(1, 0, 2)[:, :, None, :],
                           (S, R, K, P)).astype(jnp.float32),
        frames=jnp.full((S, K, L), -1, jnp.int32),
        durs=jnp.full((S, K, L), -1, jnp.int32),
        logps=jnp.zeros((S, K, L), jnp.float32),
        frame_base=jnp.zeros((S,), jnp.int32),
        emitted_base=jnp.zeros((S,), jnp.int32),
        sat=jnp.zeros((S, K), jnp.bool_),
    )


def reset_beam_device_state_rows(state: BeamDeviceState, mask,
                                 cfg: ModelConfig, dec_state, *, beam: int,
                                 token_cap: int) -> BeamDeviceState:
    """Re-init the masked stream rows from (already reset+primed)
    DecodeState rows, leaving other rows untouched — the beam analog of
    decode/batched.reset_decode_state_rows."""
    fresh = init_beam_device_state_batch(cfg, dec_state, beam=beam,
                                         token_cap=token_cap)
    m = jnp.asarray(mask)
    return jax.tree_util.tree_map(
        lambda f, o: jnp.where(m.reshape((-1,) + (1,) * (f.ndim - 1)), f, o),
        fresh, state)


def beam_device_row_to_hypotheses(state: BeamDeviceState, row: int):
    """One stream row of a batched [S, K, ...] state as host Hypothesis
    objects (finish/nbest/stable-prefix then reuse the host beam code)."""
    return beam_device_to_hypotheses(
        jax.tree_util.tree_map(lambda x: np.asarray(x)[row], state))


def beam_device_to_hypotheses(state: BeamDeviceState):
    """Fetch the device pool into host Hypothesis objects so beam_finish /
    nbest / stable-prefix reuse the host implementations verbatim."""
    from trt_asr_tpu.decode.beam import Hypothesis

    score = np.asarray(state.score)
    tokens = np.asarray(state.tokens)
    n_tok = np.asarray(state.n_tok)
    cursor = np.asarray(state.cursor)
    frames = np.asarray(state.frames)
    durs = np.asarray(state.durs)
    logps = np.asarray(state.logps)
    base = int(np.asarray(state.frame_base))
    hyps = []
    for i in range(score.shape[0]):
        if not np.isfinite(score[i]):
            continue
        n = int(n_tok[i])
        hyps.append(Hypothesis(
            score=float(score[i]), tokens=[int(t) for t in tokens[i, :n]],
            cursor=base + int(cursor[i]), y_id=int(np.asarray(state.y_id)[i]),
            stamps=[(int(frames[i, j]), int(durs[i, j]), float(logps[i, j]))
                    for j in range(n)]))
    return hyps
