"""LSTM prediction network (RNNT predictor).

Behavioral contract (reference predictor component, contract predictor.*):
inputs y [B, U] int token ids, state h/c [layers, B, P]; outputs g [B, U, P]
(the reference exports [B, P, U] BHU — conversion at the export boundary),
h'/c'. blank_as_pad: blank id embeds to the zero vector.

Hot-path form is ``predictor_step`` (U=1): one embedding row gather + two
fused LSTM matmul steps, called from inside the on-device decode loop only
on non-blank emissions (reference semantics: predictor runs only on emit —
parakeet_trt.cpp:3596-3650).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp

from trt_asr_tpu.ops.lstm import lstm_sequence, lstm_step


def embed_tokens(params: Dict[str, Any], y: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][y]


def predictor_step(
    params: Dict[str, Any], y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """y [B] int32 -> (g [B, P], h', c')."""
    x = embed_tokens(params, y)
    return lstm_step(params["lstm"], x, h, c)


def predictor_sequence(
    params: Dict[str, Any], y: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """y [B, U] -> (g [B, U, P], h', c')."""
    x = embed_tokens(params, y)
    return lstm_sequence(params["lstm"], x, h, c)


def init_predictor_state(cfg, batch: int, dtype=jnp.float32):
    return (jnp.zeros((cfg.pred_rnn_layers, batch, cfg.pred_hidden), dtype),
            jnp.zeros((cfg.pred_rnn_layers, batch, cfg.pred_hidden), dtype))
