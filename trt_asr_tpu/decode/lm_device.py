"""Device-resident shallow-fusion scorers for the device beam.

The host beam accepts any ``lm_fn(prefix, token)`` callable
(decode/beam.py:155); the device beam (decode/beam_device.py) runs the
whole search inside one jitted program, where a host callable cannot go.
This module compiles the two concrete lm_fn families the framework ships —
the stupid-backoff n-gram LM (decode/ngram_lm.py) and the contextual-
biasing trie (decode/biasing.py) — into device tables scored by pure
tensor ops, so LM fusion and hotword biasing no longer force the host
beam path (the limitation documented in beam_device.py's round-3
docstring). The reference has no LM machinery at all (greedy-only decode,
/root/reference/cpp/src/parakeet_trt.cpp:2914-3713); both the hook and
its device execution are beyond-reference capability.

TPU-first design: an n-gram table is a *sorted composite-key array*
searched by a vectorized lexicographic binary search — ``ceil(log2 N)+1``
gather+compare rounds over all query lanes at once, no host dict, no
dynamic shapes. Context tokens are packed into two int32 Horner codes
(base ``vocab+2`` so the BOS sentinel packs too); build validates
(vocab+2)^ceil(max_ctx/2) against 2^31 for the ACTUAL max context length,
so e.g. order-3 supports 2^31-2 vocab, order-5 up to 46k, order-7 to 1286.
Each backoff level (context length c = 1..order-1) is its own table;
scoring walks the levels longest-context-last so the deepest hit wins,
exactly the host's stupid-backoff loop:

    score = alpha^(order-1) * P_add1(tok)              # grounded unigram
    score = alpha^(order-1-c) * count(ctx+t)/count(ctx)  # deepest hit c

The biasing trie compiles the same way — level c holds the (proper
prefix of length c -> continuation) pairs — with "bonus iff any level
hits" combination instead of backoff.

Exactness: device scores match the host callables to f32 rounding
(tests/test_lm_device.py asserts 1e-5 on random models and query mixes),
so the device beam's fused n-best stays identical to the host beam's.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax import lax


class LMSpec(NamedTuple):
    """Hashable static half of a device LM (jit static argument)."""

    mode: str                 # "backoff" (n-gram) | "bonus" (biasing trie)
    ctx_lens: Tuple[int, ...]  # context length per level, ascending
    order: int                # n-gram order (backoff); max_pfx+1 for bonus
    log_alpha: float          # backoff penalty per skipped level
    bonus: float              # per-token reward (bonus mode)
    base: int                 # Horner packing base (vocab_size + 2)


class LMLevel(NamedTuple):
    """One context-length level: parallel arrays sorted by
    (ctx_hi, ctx_lo, tok) lexicographically."""

    ctx_hi: jnp.ndarray       # [N] int32 Horner code of the older half
    ctx_lo: jnp.ndarray       # [N] int32 Horner code of the recent half
    tok: jnp.ndarray          # [N] int32 raw next-token id
    val: jnp.ndarray          # [N] f32 level score (log count-ratio / bonus)


class LMTables(NamedTuple):
    """Traced half of a device LM (arrays ride through jit)."""

    levels: Tuple[LMLevel, ...]
    uni: jnp.ndarray          # [V] f32 grounded unigram logp (backoff);
                              # [1] zeros placeholder in bonus mode
    uni_floor: jnp.ndarray    # [] f32 add-1 logp for tokens >= V (the
                              # host's uni.get(token, 0) path)


def _split(c: int) -> Tuple[int, int]:
    """Tokens per (hi, lo) Horner code for a context of length c."""
    n_hi = c // 2
    return n_hi, c - n_hi


def _encode_np(tokens, base: int) -> Tuple[int, int]:
    """Host-side (hi, lo) codes for one context tuple (build time)."""
    c = len(tokens)
    n_hi, _ = _split(c)
    hi = lo = 0
    for t in tokens[:n_hi]:
        hi = hi * base + (int(t) + 1)       # BOS (-1) packs to 0
    for t in tokens[n_hi:]:
        lo = lo * base + (int(t) + 1)
    return hi, lo


def _build_level(entries, base: int) -> Optional[LMLevel]:
    """entries: [(ctx tuple, tok, val)] -> sorted LMLevel (None if empty)."""
    if not entries:
        return None
    rows = sorted((_encode_np(ctx, base) + (int(t), float(v)))
                  for ctx, t, v in entries)
    hi, lo, tok, val = zip(*rows)
    return LMLevel(jnp.asarray(hi, jnp.int32), jnp.asarray(lo, jnp.int32),
                   jnp.asarray(tok, jnp.int32), jnp.asarray(val, jnp.float32))


def _check_base(vocab_size: int, max_ctx_len: int) -> int:
    """Packing base, validated against the WIDEST half actually packed.

    ``_split`` puts ceil(c/2) tokens in the lo code, so the exact bound is
    (vocab + 2)^ceil(max_ctx/2) <= 2^31 — e.g. order-6 n-grams (context 5,
    three tokens per half) overflow int32 beyond vocab 1288, while order-3
    at the same vocab is fine with one token per half."""
    base = vocab_size + 2
    per_half = max(1, (max_ctx_len + 1) // 2)
    if base ** per_half > 2 ** 31:
        raise ValueError(
            f"context length {max_ctx_len} at vocab {vocab_size} overflows "
            f"the int32 Horner code: {per_half} tokens per half needs "
            f"(vocab + 2)^{per_half} <= 2^31. Reduce the n-gram order / "
            "biasing phrase length, or the vocabulary.")
    return base


def ngram_to_device(lm) -> Tuple[LMSpec, LMTables]:
    """Compile a decode/ngram_lm.NGramLM into device tables. Scoring is
    exact vs ``lm.score`` up to f32 rounding."""
    base = _check_base(lm.vocab_size, lm.order - 1)
    # The dense device unigram table (and Horner digit uniqueness) need
    # every trained id < vocab_size; the host dict would silently serve a
    # count for an out-of-range id where the device serves the add-1 floor.
    tmax = max((t for ctx, counter in lm.counts.items()
                for t in (*ctx, *counter)), default=-1)
    if tmax >= lm.vocab_size:
        raise ValueError(
            f"trained token id {tmax} >= vocab_size {lm.vocab_size}: "
            "device and host scoring would diverge (dense unigram table / "
            "Horner digits cannot represent it). Refit or load the LM with "
            "vocab_size > the max token id.")
    levels, ctx_lens = [], []
    for c in range(1, lm.order):
        entries = []
        for ctx, counter in lm.counts.items():
            if len(ctx) != c:
                continue
            total = lm.totals[ctx]
            entries.extend((ctx, t, np.log(n / total))
                           for t, n in counter.items())
        lev = _build_level(entries, base)
        if lev is not None:
            levels.append(lev)
            ctx_lens.append(c)
    # grounded unigram: count ratio when seen, add-1 floor when not
    # (ngram_lm.py prob(): the empty-context terminal case)
    uni_counts = lm.counts.get((), {})
    total = lm.totals.get((), 0)
    uni = np.full(lm.vocab_size, 1.0 / (total + lm.vocab_size + 1))
    for t, n in uni_counts.items():
        if 0 <= t < lm.vocab_size:
            uni[t] = n / total
    spec = LMSpec(mode="backoff", ctx_lens=tuple(ctx_lens), order=lm.order,
                  log_alpha=float(np.log(lm.alpha)), bonus=0.0, base=base)
    floor = np.log(1.0 / (total + lm.vocab_size + 1))
    return spec, LMTables(levels=tuple(levels),
                          uni=jnp.asarray(np.log(uni), jnp.float32),
                          uni_floor=jnp.float32(floor))


def biasing_to_device(bias) -> Tuple[LMSpec, LMTables]:
    """Compile a decode/biasing.BiasingLM (phrase-prefix trie) into device
    tables: level c holds (length-c proper prefix -> continuation) pairs."""
    base = _check_base(bias.vocab_size,
                       max((len(p) for p in bias.cont), default=0))
    by_len = {}
    for pfx, nexts in bias.cont.items():
        by_len.setdefault(len(pfx), []).extend(
            (pfx, t, bias.bonus) for t in sorted(nexts))
    levels, ctx_lens = [], []
    for c in sorted(by_len):
        levels.append(_build_level(by_len[c], base))
        ctx_lens.append(c)
    spec = LMSpec(mode="bonus", ctx_lens=tuple(ctx_lens),
                  order=(max(ctx_lens) + 1 if ctx_lens else 1),
                  log_alpha=0.0, bonus=float(bias.bonus), base=base)
    return spec, LMTables(levels=tuple(levels),
                          uni=jnp.zeros((1,), jnp.float32),
                          uni_floor=jnp.float32(0.0))


def to_device(lm_fn) -> Optional[Tuple[LMSpec, LMTables]]:
    """Compile a supported host lm_fn (NGramLM / BiasingLM) for the device
    beam; None for arbitrary callables (the host beam remains their
    surface)."""
    from trt_asr_tpu.decode.biasing import BiasingLM
    from trt_asr_tpu.decode.ngram_lm import NGramLM

    if isinstance(lm_fn, NGramLM):
        return ngram_to_device(lm_fn)
    if isinstance(lm_fn, BiasingLM):
        return biasing_to_device(lm_fn)
    return None


def _lookup(level: LMLevel, qh, ql, qt):
    """Vectorized lexicographic binary search: for each query lane the
    lower-bound position of (qh, ql, qt), then an exact-match check.
    Returns (found [Q] bool, val [Q] f32)."""
    n = level.tok.shape[0]
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    lo = jnp.zeros_like(qh)
    hi = jnp.full_like(qh, n)

    def body(_, lh):
        lo, hi = lh
        mid = (lo + hi) // 2
        mh, ml, mt = level.ctx_hi[mid], level.ctx_lo[mid], level.tok[mid]
        lt = (mh < qh) | ((mh == qh) & ((ml < ql) | ((ml == ql) & (mt < qt))))
        return jnp.where(lt, mid + 1, lo), jnp.where(lt, hi, mid)

    lo, _ = lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.minimum(lo, n - 1)
    found = ((lo < n) & (level.ctx_hi[pos] == qh)
             & (level.ctx_lo[pos] == ql) & (level.tok[pos] == qt))
    return found, level.val[pos]


def lm_scores(spec: LMSpec, tables: LMTables, tok_buf: jnp.ndarray,
              n_tok: jnp.ndarray, cands: jnp.ndarray) -> jnp.ndarray:
    """Score candidate continuations for a hypothesis set.

    tok_buf [K, L] (-1 padded), n_tok [K], cands [K, k] raw token ids
    -> [K, k] f32, elementwise equal (f32) to the host
    ``lm_fn(prefix_tokens, cand)``. Context extraction pads short
    prefixes with BOS exactly like NGramLM.score; for the biasing trie
    a BOS-padded context can never equal a stored all-real-token prefix,
    which reproduces the host's "suffix no longer than the prefix" rule
    with no extra masking.
    """
    K, L = tok_buf.shape
    k = cands.shape[1]
    base = jnp.int32(spec.base)
    qt = cands.reshape(-1)                                     # [K*k]

    if spec.mode == "backoff":
        v_lm = tables.uni.shape[0]
        out = jnp.where(cands < v_lm,
                        tables.uni[jnp.clip(cands, 0, v_lm - 1)],
                        tables.uni_floor) \
            + spec.log_alpha * (spec.order - 1)                # [K, k]
    else:
        out = jnp.zeros((K, k), jnp.float32)

    for level, c in zip(tables.levels, spec.ctx_lens):
        # last-c context values, BOS(-1) beyond the prefix start
        j = jnp.arange(c)[None, :]                             # [1, c]
        idx = n_tok[:, None] - c + j                           # [K, c]
        vals = jnp.where(
            idx >= 0,
            jnp.take_along_axis(tok_buf, jnp.clip(idx, 0, L - 1), axis=1),
            -1) + 1                                            # packed +1
        n_hi, _ = _split(c)
        hi = jnp.zeros((K,), jnp.int32)
        lo = jnp.zeros((K,), jnp.int32)
        for t in range(n_hi):
            hi = hi * base + vals[:, t].astype(jnp.int32)
        for t in range(n_hi, c):
            lo = lo * base + vals[:, t].astype(jnp.int32)
        qh = jnp.repeat(hi, k)                                 # [K*k]
        ql = jnp.repeat(lo, k)
        found, v = _lookup(level, qh, ql, qt)
        found = found.reshape(K, k)
        v = v.reshape(K, k)
        if spec.mode == "backoff":
            # deeper context wins (levels ascend, later writes overwrite)
            out = jnp.where(found, v + spec.log_alpha * (spec.order - 1 - c),
                            out)
        else:
            out = jnp.where(found & (out == 0.0), v, out)
    return out
