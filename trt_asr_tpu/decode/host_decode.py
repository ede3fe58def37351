"""Host-side reference TDT greedy decode.

Semantics mirror the reference's PyTorch trace generator
(tools/verify_nemo/tdt_trace.py:259-356) and its C++ hot loop
(cpp/src/parakeet_trt.cpp:2914-3713):

- dual argmax over token head [0, V+1) and duration head tail bins
- advance = duration_values[argmax(dur)]; blank with duration 0 clamps to
  advance 1 (TDT paper rule; contract decode.blank_duration_zero_policy)
- non-blank: emit + predictor step (predictor runs ONLY on emission; the
  cached g is reused across blank steps)
- at most max_symbols_per_timestep inner steps, then forced +1 advance
- optional blank penalty and leading-punctuation suppression

Backend-agnostic: takes joint/predictor callables so the same driver runs
over the torch oracle or the JAX modules — this is the decode analog of the
reference's golden-trace comparison (compare_tdt_trace.py). Emits optional
per-step trace records in the reference's JSONL schema.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def tdt_greedy_decode_host(
    enc: np.ndarray,                   # [T_enc, D] valid encoder steps
    joint_fn: Callable,                # (enc_t [D], g [P]) -> logits [V_joint]
    predictor_fn: Callable,            # (token_id, state) -> (g [P], state)
    state,                             # opaque predictor state
    g: np.ndarray,                     # current predictor output [P]
    y_id: int,
    *,
    blank_id: int,
    token_head_size: int,
    duration_values: Sequence[int],
    max_symbols: int = 8,
    blank_penalty: float = 0.0,
    punct_token_ids: Optional[set] = None,
    emitted_so_far: int = 0,
    trace: Optional[List[Dict]] = None,
    time_offset: int = 0,
    trace_topk: int = 0,        # per-step top-k token logits + logsumexp in
                                # the trace (reference tdt_trace.py:294-356
                                # and PARAKEET_DEBUG_JOINT_TOPK)
    stamps_out: Optional[List[Tuple[int, int, float]]] = None,
                                # per emitted token, append (emission frame
                                # incl. time_offset, predicted TDT duration,
                                # log-softmax confidence of the token) —
                                # host reference for the device kernels'
                                # with_timestamps output
) -> Tuple[List[int], object, np.ndarray, int]:
    """Decode one chunk. Returns (emitted tokens, state, g, y_id)."""
    t_enc = enc.shape[0]
    emitted: List[int] = []
    time_idx = 0
    n_total = emitted_so_far
    while time_idx < t_enc:
        advanced = False
        for u in range(max_symbols):
            logits = np.asarray(joint_fn(enc[time_idx], g), dtype=np.float32)
            tok_logits = logits[:token_head_size].copy()
            dur_logits = logits[token_head_size : token_head_size + len(duration_values)]
            if blank_penalty:
                tok_logits[blank_id] -= blank_penalty
            best_tok = int(np.argmax(tok_logits))
            if (punct_token_ids and n_total == 0 and best_tok != blank_id
                    and best_tok in punct_token_ids):
                best_tok = blank_id  # leading-punct suppression (ref :3256-3262)
            best_dur_idx = int(np.argmax(dur_logits))
            duration = int(duration_values[best_dur_idx])
            advance = duration
            clamped = False
            if best_tok == blank_id and duration == 0:
                advance = 1
                clamped = True
            if trace is not None:
                rec = {
                    "type": "step", "time_idx": time_offset + time_idx, "u": u,
                    "y_id": int(y_id), "best_tok": best_tok,
                    "is_blank": bool(best_tok == blank_id),
                    "best_dur_idx": best_dur_idx, "duration": duration,
                    "advance": advance, "blank_dur0_clamped": clamped,
                }
                if trace_topk:
                    idx = np.argsort(tok_logits)[::-1][:trace_topk]
                    m = float(tok_logits.max())
                    rec["topk"] = [[int(i), float(tok_logits[i])] for i in idx]
                    rec["logsumexp"] = m + float(
                        np.log(np.sum(np.exp(tok_logits - m))))
                trace.append(rec)
            if best_tok != blank_id:
                emitted.append(best_tok)
                if stamps_out is not None:
                    m = float(tok_logits.max())
                    lse = m + float(np.log(np.sum(np.exp(tok_logits - m))))
                    stamps_out.append((time_offset + time_idx, duration,
                                       float(tok_logits[best_tok]) - lse))
                n_total += 1
                g, state = predictor_fn(best_tok, state)
                y_id = best_tok
            if advance == 0:
                continue
            time_idx += advance
            advanced = True
            break
        if not advanced:
            time_idx += 1
    return emitted, state, g, y_id
