"""Training step: TDT loss over the full model, with optax.

Beyond-reference capability (the reference is inference-only). Supports the
multi-chip path: the step is pure and jit-able under a mesh with dp-sharded
batch and tp-sharded encoder weights (see parallel/mesh.py and
__graft_entry__.dryrun_multichip).

Notes: inference-mode normalization (frozen BN stats, no dropout) — this is
a fine-tuning/continued-training configuration, documented intentionally.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.encoder import encode
from trt_asr_tpu.models.parakeet.joint import joint_apply
from trt_asr_tpu.models.parakeet.predictor import predictor_sequence
from trt_asr_tpu.train.tdt_loss import tdt_loss


class Batch(NamedTuple):
    feats: jnp.ndarray      # [B, T, F]
    feat_len: jnp.ndarray   # [B]
    labels: jnp.ndarray     # [B, U]
    label_len: jnp.ndarray  # [B]


def training_forward(params: Dict[str, Any], cfg: ModelConfig, batch: Batch,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """feats+labels -> per-example TDT NLL [B]."""
    enc, t_len, _ = encode(params, cfg, batch.feats, batch.feat_len, None,
                           compute_dtype=compute_dtype)
    b, u = batch.labels.shape
    # decoder input: [SOS(=blank, zero embedding)] ++ labels  (RNNT standard)
    sos = jnp.full((b, 1), cfg.blank_id, jnp.int32)
    y_in = jnp.concatenate([sos, batch.labels.astype(jnp.int32)], axis=1)
    h0 = jnp.zeros((cfg.pred_rnn_layers, b, cfg.pred_hidden), compute_dtype)
    g, _, _ = predictor_sequence(params["predictor"], y_in, h0, h0)      # [B, U+1, P]
    logits = joint_apply(params["joint"], enc.astype(jnp.float32), g.astype(jnp.float32))
    return tdt_loss(
        logits, batch.labels, t_len.astype(jnp.int32), batch.label_len.astype(jnp.int32),
        duration_values=cfg.duration_values, token_head_size=cfg.token_head_size,
        blank_id=cfg.blank_id)


def make_train_step(cfg: ModelConfig, optimizer=None, compute_dtype=jnp.float32):
    """Returns (init_opt_state, train_step). train_step is jit-able/pjit-able."""
    optimizer = optimizer or optax.adamw(1e-4)

    def loss_fn(params, batch: Batch):
        nll = training_forward(params, cfg, batch, compute_dtype)
        return jnp.mean(nll)

    def train_step(params, opt_state, batch: Batch) -> Tuple[Any, Any, Dict[str, jnp.ndarray]]:
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    return optimizer.init, train_step
