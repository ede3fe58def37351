"""Contextual biasing (hotwords) for the beam decoder's LM-fusion hook.

Beyond-reference capability. ``make_biasing_lm`` compiles a phrase list
(product names, contacts, jargon — text, via Tokenizer.encode) into a
token-prefix trie and returns an ``lm_fn(prefix_tokens, candidate)``
suitable for decode/beam.py's shallow fusion: a candidate token earns
``bonus`` log-probability iff it starts a phrase or continues one that a
suffix of the decoded prefix has partially matched. This is the standard
per-token contextual-biasing scheme for transducers — the boost applies
while INSIDE a phrase, so multi-token phrases accumulate an advantage
proportional to their length, and hypotheses that abandon a phrase
midway keep only the tokens they actually matched (no lookahead debt to
unwind: the beam's per-emission fusion is already path-additive).

Works on every surface that accepts lm_fn/lm_weight: offline beam
(ParakeetTDT.transcribe_offline_beam), the streaming beam session, and
the CLI (--bias/--bias-bonus). Greedy paths are untouched (fusion is a
beam feature; beam=1 stays exactly greedy by design).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple


class BiasingLM:
    """A compiled phrase-prefix trie, callable as the beam's lm_fn.

    Exposed as a class (not a closure) so the device beam can recompile
    the same trie into tensor tables (decode/lm_device.biasing_to_device)
    — both surfaces score identically."""

    def __init__(self, cont: Dict[Tuple[int, ...], Set[int]],
                 max_pfx: int, bonus: float, vocab_size: int):
        self.cont = cont           # proper prefix -> continuation tokens
        self.max_pfx = max_pfx
        self.bonus = float(bonus)
        self.vocab_size = int(vocab_size)

    def __call__(self, prefix: List[int], tok: int) -> float:
        for k in range(0, min(self.max_pfx, len(prefix)) + 1):
            nexts = self.cont.get(tuple(prefix[len(prefix) - k:]))
            if nexts and tok in nexts:
                return self.bonus
        return 0.0


def make_biasing_lm(phrases: Iterable[str], tokenizer, *,
                    bonus: float = 3.0) -> BiasingLM:
    """Compile phrase strings into a biasing lm_fn. ``bonus`` is the
    log-prob reward per matched token (pre lm_weight scaling)."""
    unk = tokenizer.token_id("<unk>") if hasattr(tokenizer, "token_id") else -1
    token_phrases: List[Sequence[int]] = []
    for p in phrases:
        ids = tuple(tokenizer.encode(p))
        # a phrase the vocab cannot represent encodes (partly) to <unk>;
        # biasing it would reward EVERY <unk> emission (+bonus each) and
        # silently distort scores stream-wide — drop it instead
        if ids and unk not in ids:
            token_phrases.append(ids)
    # precompiled trie: proper prefix -> continuation tokens. lm_fn runs
    # inside the beam's per-frame hot loop, so a query must be a handful
    # of dict lookups, not a rescan of the phrase list
    cont: dict = {}
    for p in token_phrases:
        for k in range(len(p)):
            cont.setdefault(p[:k], set()).add(p[k])
    max_pfx = max((len(p) - 1 for p in token_phrases), default=0)
    # vocab size only parameterizes the device table packing; fall back to
    # the largest phrase token for tokenizer stubs without .vocab
    vocab = getattr(tokenizer, "vocab", None)
    vocab_size = len(vocab) if vocab is not None else 1 + max(
        (t for p in token_phrases for t in p), default=0)
    return BiasingLM(cont, max_pfx, bonus, vocab_size)
