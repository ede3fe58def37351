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
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet.encoder import (encode, init_encoder_state,
                                                 precompute_pos_proj)
from trt_asr_tpu.models.parakeet.joint import joint_apply
from trt_asr_tpu.models.parakeet.predictor import predictor_sequence
from trt_asr_tpu.train.tdt_loss import tdt_loss


class Batch(NamedTuple):
    feats: jnp.ndarray      # [B, T, F]
    feat_len: jnp.ndarray   # [B]
    labels: jnp.ndarray     # [B, U]
    label_len: jnp.ndarray  # [B]


def streaming_encode_train(params: Dict[str, Any], cfg: ModelConfig,
                           feats: jnp.ndarray, feat_len: jnp.ndarray,
                           compute_dtype=jnp.float32, remat: bool = False):
    """Streaming-consistent encoder forward for TRAINING: a `lax.scan` over
    the SAME unified steady-chunk program the serving session runs
    (`streaming/session.py:_run_chunk`: drop_extra, cache_drop,
    valid_cap=valid_out_len), threading `EncoderState` chunk to chunk.

    Why this exists: the offline encoder sees full bidirectional context,
    but serving restricts attention to [ring cache | current 57-frame
    window] — a model trained offline degrades word-by-word as the
    streaming context diverges (measured: 8-13-word utterances decode at
    84% WER from a model whose offline held-out loss was 0.23). NeMo
    trains its cache-aware models with chunked limited-context attention
    for the same reason (paper 2312.17279); here training runs *through
    the serving encoder itself*, so train and serve run the same program
    semantics per chunk (measured max |delta| 1.5e-6 vs the serving loop —
    XLA fusion re-association between the scanned and per-chunk
    compilations, nothing structural).

    Geometry (unified single-program schedule, schedule.py:ChunkScheduler):
    chunk k's input window covers feature frames
    [k*shift - lead, k*shift - lead + window) where window = steady_chunk +
    pre_encode and lead = window - first_chunk; the first `drop_extra`
    post-subsample steps are dropped and the next `valid_out_len` are
    emitted, so emissions tile the stream at shift/subsampling steps per
    chunk and sum(out_len) == subsampled_length(feat_len) exactly.

    Returns (enc [B, n_chunks*valid_out_len, D], enc_len [B]).
    """
    from trt_asr_tpu.streaming.schedule import StreamingRegime

    b, t, f = feats.shape
    regime = StreamingRegime.from_config(cfg)
    first_chunk, steady = regime.chunk_sizes
    pre = regime.pre_encode[1]
    shift = regime.shift_sizes[1]
    window = steady + pre
    lead = window - first_chunk
    drop = regime.drop_extra
    v = regime.valid_out_len
    # The constant-shift scan reproduces serving's unified schedule ONLY
    # when chunk windows tile: chunk k>=1 at start_k = shift0 + (k-1)*shift1
    # must coincide with the scan's window [k*shift1 - lead, ...), i.e.
    # shift0 == first_chunk + shift1 - steady (cache3: 41+24-48 = 17), with
    # the tiling chunk-0 semantics. Reject anything else rather than
    # silently training a schedule serving won't run (the exact class of
    # train/serve mismatch this function exists to prevent).
    if regime.nemo_chunk0_drop:
        raise ValueError(
            "streaming_encode_train emulates the unified (tiling) chunk-0 "
            "semantics; nemo_compat_chunk0 regimes need the two-program "
            "schedule (same restriction as ChunkScheduler(unified=True))")
    if regime.shift_sizes[0] != first_chunk + shift - steady or lead < 0:
        raise ValueError(
            f"streaming regime {regime} does not tile under a constant "
            f"shift: need shift0 == first_chunk + shift1 - steady "
            f"(got {regime.shift_sizes[0]} != {first_chunk + shift - steady})")
    n_chunks = max(1, -(-(t + lead) // shift))
    pad_r = max(0, shift * (n_chunks - 1) + window - (t + lead))
    xpad = jnp.pad(feats.astype(compute_dtype), ((0, 0), (lead, pad_r), (0, 0)))

    tqw = regime.sub_len(window) - drop
    pos_proj = precompute_pos_proj(params, cfg, tqw, cfg.att_cache_size,
                                   compute_dtype)

    state0 = init_encoder_state(cfg, b, dtype=compute_dtype)
    feat_len = feat_len.astype(jnp.int32)

    def body(state, k):
        win = lax.dynamic_slice(xpad, (0, k * shift, 0), (b, window, f))
        valid = jnp.clip(feat_len + lead - k * shift, 0, window)
        enc, out_len, state = encode(
            params, cfg, win, valid, state, drop_extra=drop,
            cache_drop=cfg.cache_drop_size, valid_cap=v,
            pos_proj=pos_proj, compute_dtype=compute_dtype, remat=remat)
        return state, (enc[:, :v, :], out_len)

    if remat:
        # checkpoint the chunk axis too: activation HBM becomes O(1) in
        # BOTH layers and chunks (two nested recomputation levels)
        body = jax.checkpoint(body)
    _, (encs, lens) = lax.scan(body, state0, jnp.arange(n_chunks))
    enc = jnp.swapaxes(encs, 0, 1).reshape(b, n_chunks * v, -1)
    return enc, jnp.sum(lens, axis=0)


def training_forward(params: Dict[str, Any], cfg: ModelConfig, batch: Batch,
                     compute_dtype=jnp.float32,
                     streaming: bool = False,
                     remat: bool = False) -> jnp.ndarray:
    """feats+labels -> per-example TDT NLL [B].

    streaming=True trains through the serving chunk schedule
    (streaming_encode_train) instead of the offline full-context encoder —
    required when the trained model will be served streaming.
    remat=True rematerializes encoder-layer (and, streaming, per-chunk)
    activations on the backward pass — identical gradients, O(1) instead
    of O(layers [x chunks]) activation HBM, one extra forward of compute
    (tests/test_training.py pins gradient equality and the measured
    memory drop)."""
    if streaming:
        enc, t_len = streaming_encode_train(params, cfg, batch.feats,
                                            batch.feat_len, compute_dtype,
                                            remat=remat)
    else:
        enc, t_len, _ = encode(params, cfg, batch.feats, batch.feat_len, None,
                               compute_dtype=compute_dtype, remat=remat)
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


def make_optimizer(peak_lr: float = 1e-3, *, schedule: str = "cosine_warmup",
                   warmup_steps: int = 1000, total_steps: int = 100_000,
                   min_lr_ratio: float = 0.01, weight_decay: float = 1e-3,
                   grad_clip: float = 1.0, accum_steps: int = 1):
    """Standard ASR training optimizer: global-norm clipping + AdamW under
    a warmup schedule. Returns (optimizer, schedule_fn) — schedule_fn maps
    step -> lr for logging/tests.

    schedules: "noam" (inverse-sqrt with linear warmup, the Conformer
    paper's), "cosine_warmup" (NeMo's parakeet recipe shape), "constant".

    ``accum_steps`` > 1 wraps the transform in optax.MultiSteps: gradients
    average over N microbatch calls before one real update (params are
    frozen in between) — the effective-batch lever when the per-chip batch
    is memory-bound. N equal-size microbatches match one N-times-larger
    batch exactly up to float re-association (tested), since the loss is a
    per-example mean.
    """
    if schedule == "noam":
        def schedule_fn(step):
            s = jnp.maximum(step, 1).astype(jnp.float32)
            return peak_lr * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5) \
                * warmup_steps ** 0.5
    elif schedule == "cosine_warmup":
        schedule_fn = optax.warmup_cosine_decay_schedule(
            0.0, peak_lr, warmup_steps, total_steps,
            end_value=peak_lr * min_lr_ratio)
    elif schedule == "constant":
        schedule_fn = optax.constant_schedule(peak_lr)
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        optax.adamw(schedule_fn, weight_decay=weight_decay))
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx, schedule_fn


def make_train_step(cfg: ModelConfig, optimizer=None, compute_dtype=jnp.float32,
                    streaming: bool = False, augment: Optional[dict] = None,
                    remat: bool = False):
    """Returns (init_opt_state, train_step). train_step is jit-able/pjit-able.

    ``augment``: kwargs for train/augment.py spec_augment; when set,
    train_step takes an extra PRNG key argument and masks the batch's
    features before the forward pass (training-time only — the serving
    path never sees it)."""
    optimizer = optimizer or optax.adamw(1e-4)

    def loss_fn(params, batch: Batch):
        nll = training_forward(params, cfg, batch, compute_dtype,
                               streaming=streaming, remat=remat)
        return jnp.mean(nll)

    def _update(params, opt_state, batch: Batch) -> Tuple[Any, Any, Dict[str, jnp.ndarray]]:
        # the single update body both variants share — augmentation only
        # changes what the loss sees, never how the update happens
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    if augment is not None:
        from trt_asr_tpu.train.augment import spec_augment

        aug_kw = dict(augment)

        def train_step(params, opt_state, batch: Batch, rng):
            batch = batch._replace(feats=spec_augment(
                rng, batch.feats, batch.feat_len, **aug_kw))
            return _update(params, opt_state, batch)

        return optimizer.init, train_step

    return optimizer.init, _update
