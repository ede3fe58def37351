"""Token-and-Duration Transducer (TDT) loss — forward algorithm over the
duration lattice.

Beyond-reference capability: the reference is inference-only; this provides
the training objective for the same joint output layout (token head ++
duration head, contract joint.*), per the TDT paper (2304.06795, vendored by
the reference in docs/txt/): the joint factorizes into P_tok(v|t,u) and
P_dur(d|t,u); transitions from lattice node (t, u), t < t_len:

- emit label y_{u+1} with duration d in D        -> (t+d, u+1)
- emit blank with duration d in D, d > 0         -> (t+d, u)

A path terminates once it has emitted all U labels and its time index
reaches (t == t_len) or jumps past (t > t_len) the end — overshoot counts
as termination, matching the decoder's end-of-utterance behavior. No
emissions happen at t == t_len (the decode loop exits there).

Implementation: lax.scan over t carrying a window of the last max(D) alpha
rows; the duration-0 label-emission chain within a row is an inner scan
over u. All log-space f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("duration_values", "token_head_size", "blank_id"))
def tdt_loss(
    logits: jnp.ndarray,          # [B, T, U+1, V_joint] raw joint logits
    labels: jnp.ndarray,          # [B, U] int32
    t_len: jnp.ndarray,           # [B] valid encoder steps
    u_len: jnp.ndarray,           # [B] valid label counts
    *,
    duration_values: Tuple[int, ...],
    token_head_size: int,
    blank_id: int,
) -> jnp.ndarray:
    """Returns per-example negative log-likelihood [B]."""
    b, t_max, u1, _ = logits.shape
    durs = tuple(int(d) for d in duration_values)
    d_max = max(durs)
    neg_inf = jnp.float32(-1e30)

    lp_tok = jax.nn.log_softmax(logits[..., :token_head_size].astype(jnp.float32), axis=-1)
    lp_dur = jax.nn.log_softmax(logits[..., token_head_size:].astype(jnp.float32), axis=-1)

    lp_blank = lp_tok[..., blank_id]                                    # [B, T, U+1]
    lab = jnp.concatenate([labels.astype(jnp.int32),
                           jnp.zeros((b, 1), jnp.int32)], axis=1)       # pad at u=U
    lp_lab = jnp.take_along_axis(lp_tok, lab[:, None, :, None], axis=-1)[..., 0]

    # mask: label emission only for u < u_len; every emission only for t < t_len
    u_ok = jnp.arange(u1)[None, :] < u_len[:, None]                     # [B, U+1]
    t_ok = jnp.arange(t_max)[None, :] < t_len[:, None]                  # [B, T]
    lp_lab = jnp.where(u_ok[:, None, :] & t_ok[:, :, None], lp_lab, neg_inf)
    lp_blank = jnp.where(t_ok[:, :, None], lp_blank, neg_inf)

    # pad time axis so dynamic t-d / t0 indexing never goes out of bounds
    pad = ((0, 0), (0, d_max + 1), (0, 0))
    lp_blank_p = jnp.pad(lp_blank, pad, constant_values=-1e30)
    lp_lab_p = jnp.pad(lp_lab, pad, constant_values=-1e30)
    lp_dur_p = jnp.pad(lp_dur, pad + ((0, 0),), constant_values=-1e30)

    d0 = 0 in durs
    d0_idx = durs.index(0) if d0 else -1

    def at_t(arr, t):
        """arr [B, T+pad, ...] -> arr[:, t] for a (clamped) dynamic scalar t."""
        return lax.dynamic_index_in_dim(arr, jnp.maximum(t, 0), axis=1, keepdims=False)

    def row_d0_chain(row, t):
        """row[u+1] <- logaddexp(row[u+1], row[u] + lp_lab[t,u] + lp_dur0[t,u])."""
        if not d0:
            return row
        trans = (at_t(lp_lab_p, t) + at_t(lp_dur_p[..., d0_idx], t))[:, :-1]   # [B, U]

        def scan_u(carry, inp):
            inc, tr = inp
            new = jnp.logaddexp(inc, carry + tr)
            return new, new

        _, rest = lax.scan(scan_u, row[:, 0], (row[:, 1:].T, trans.T))
        return jnp.concatenate([row[:, :1], rest.T], axis=1)

    alpha0_raw = jnp.full((b, u1), neg_inf).at[:, 0].set(0.0)
    alpha0 = row_d0_chain(alpha0_raw, jnp.int32(0))

    window0 = jnp.full((d_max, b, u1), neg_inf).at[-1].set(alpha0)

    def step_t(window, t):
        acc = jnp.full((b, u1), neg_inf)
        for di, d in enumerate(durs):
            if d == 0:
                continue
            src_t = t - d
            row_src = window[d_max - d]                                 # alpha[t-d] (chained)
            lpb = at_t(lp_blank_p, src_t)
            lpl = at_t(lp_lab_p, src_t)
            lpd = at_t(lp_dur_p[..., di], src_t)
            stay = row_src + lpb + lpd
            move = row_src + lpl + lpd
            move = jnp.concatenate([jnp.full((b, 1), neg_inf), move[:, :-1]], axis=1)
            cand = jnp.logaddexp(stay, move)
            acc = jnp.where(src_t >= 0, jnp.logaddexp(acc, cand), acc)
        chained = row_d0_chain(acc, t)
        new_window = jnp.concatenate([window[1:], chained[None]], axis=0)
        # emit the RAW (pre-chain) row too: the final row t == t_len must not
        # include within-row emissions (no emissions at t_len)
        return new_window, (chained, acc)

    ts = jnp.arange(1, t_max + 1)
    _, (rows_chained, rows_raw) = lax.scan(step_t, window0, ts)
    alpha = jnp.concatenate([alpha0[None], rows_chained], axis=0)       # [T+1, B, U+1]
    alpha_raw = jnp.concatenate([alpha0_raw[None], rows_raw], axis=0)

    bt = jnp.arange(b)
    final = alpha_raw[t_len, bt, u_len]                                 # exact arrival
    # overshooting terminations: from t0 = t_len - back with duration d > back
    for di, d in enumerate(durs):
        for back in range(1, d):
            t0 = t_len - back
            t0c = jnp.maximum(t0, 0)
            a_blank = (alpha[t0c, bt, u_len] + lp_blank_p[bt, t0c, u_len]
                       + lp_dur_p[bt, t0c, u_len, di])
            um1 = jnp.maximum(u_len - 1, 0)
            a_lab = (alpha[t0c, bt, um1] + lp_lab_p[bt, t0c, um1]
                     + lp_dur_p[bt, t0c, um1, di])
            a_lab = jnp.where(u_len > 0, a_lab, neg_inf)
            term = jnp.logaddexp(a_blank, a_lab)
            final = jnp.where(t0 >= 0, jnp.logaddexp(final, term), final)
    return -final
