"""Multi-layer LSTM with torch-compatible semantics.

Gate order (i, f, g, o), sigmoid/tanh activations, separate input/hidden
biases — so torch-exported predictor weights load without transformation
beyond a transpose. Weights are stored right-multiplication style
([in, 4*hidden]) so the step is two MXU matmuls + fused elementwise gates.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from trt_asr_tpu.ops.common import matmul


def lstm_cell(p: Dict[str, jnp.ndarray], x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray):
    """x [B, In], h/c [B, P] -> (h', c')."""
    gates = matmul(x, p["wi"]) + matmul(h, p["wh"]) + p["bi"] + p["bh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_step(layers: List[Dict[str, jnp.ndarray]], x: jnp.ndarray,
              h: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One time step through all layers.

    x [B, In]; h, c [num_layers, B, P] (torch state layout).
    Returns (top-layer output [B, P], h', c').
    """
    hs, cs = [], []
    inp = x
    for li, p in enumerate(layers):
        h_new, c_new = lstm_cell(p, inp, h[li], c[li])
        hs.append(h_new)
        cs.append(c_new)
        inp = h_new
    return inp, jnp.stack(hs), jnp.stack(cs)


def lstm_sequence(layers: List[Dict[str, jnp.ndarray]], xs: jnp.ndarray,
                  h: jnp.ndarray, c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """xs [B, U, In] -> (outputs [B, U, P], h', c') via lax.scan over U."""

    def body(carry, x_t):
        h_t, c_t = carry
        out, h_n, c_n = lstm_step(layers, x_t, h_t, c_t)
        return (h_n, c_n), out

    (h_f, c_f), outs = lax.scan(body, (h, c), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(outs, 0, 1), h_f, c_f
