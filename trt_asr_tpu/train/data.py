"""Manifest-driven training data pipeline.

Completes the fine-tuning story: the eval manifests (TSV: audio_path,
transcript, sha256, duration — eval/manifest.py, same format the WER gate
pins) become training batches directly — wav -> log-mel (+ per-feature
norm) -> Tokenizer.encode labels -> length-bucketed, padded Batch pytrees
ready for make_train_step (dp-shardable as-is).

Design points:
- length bucketing: entries are shuffled per round, then locally sorted
  by duration so each batch pads to its own bucket, not the global max
  (the padding-waste lever the offline perf sweeps measured);
- feature T pads up to ``bucket_multiple`` to bound the number of
  compiled train-step shapes (static-shape discipline, CLAUDE.md);
- pure host-side numpy; nothing here traces — the train step stays the
  only jit surface.

The reference has no training pipeline at all (inference-only, SURVEY
§2.5); NeMo's is the model family's canonical one — this is its minimal
TPU-native counterpart, not a port.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from trt_asr_tpu.train.train_step import Batch


def batches_from_manifest(
    manifest_path: str,
    model,
    batch_size: int,
    *,
    rounds: int = 1,
    seed: int = 0,
    bucket_multiple: int = 128,
    feature_norm: str = "per_feature",
    max_label_len: Optional[int] = None,
    verify_sha: bool = False,
) -> Iterator[Batch]:
    """Yield padded Batch pytrees over ``rounds`` shuffled epochs."""
    from trt_asr_tpu.eval.manifest import read_manifest
    from trt_asr_tpu.io.wav import load_wav

    entries = read_manifest(manifest_path, verify_sha=verify_sha)
    if not entries:
        return
    rng = np.random.default_rng(seed)
    for _ in range(rounds):
        order = rng.permutation(len(entries))
        # sort-shard-shuffle: local length-sort inside shuffled
        # super-batches keeps each yielded batch length-homogeneous
        # (bounded padding waste), then the batch ORDER is reshuffled so
        # the epoch stays stochastic even when a super-batch spans the
        # whole (small) dataset
        span = max(batch_size * 8, batch_size)
        batches_idx: List[np.ndarray] = []
        for g0 in range(0, len(order), span):
            chunk = order[g0 : g0 + span]
            durs = np.array([entries[i].duration_sec for i in chunk])
            chunk = chunk[np.argsort(durs, kind="stable")]
            batches_idx.extend(chunk[b0 : b0 + batch_size]
                               for b0 in range(0, len(chunk), batch_size))
        for bi in rng.permutation(len(batches_idx)):
            idx = batches_idx[bi]
            feats, labels = [], []
            for i in idx:
                e = entries[i]
                audio = load_wav(e.audio_path)
                feats.append(model.features(audio, norm=feature_norm))
                ids = model.tokenizer.encode(e.transcript)
                if max_label_len:
                    ids = ids[:max_label_len]
                labels.append(ids)
            t_max = max(f.shape[0] for f in feats)
            t_pad = max(-(-t_max // bucket_multiple) * bucket_multiple,
                        bucket_multiple)
            u_max = max(1, max(len(l) for l in labels))
            bsz = len(idx)
            x = np.zeros((bsz, t_pad, model.cfg.feat_in), np.float32)
            y = np.zeros((bsz, u_max), np.int32)
            fl = np.zeros((bsz,), np.int32)
            ll = np.zeros((bsz,), np.int32)
            for k, (f, l) in enumerate(zip(feats, labels)):
                x[k, : f.shape[0]] = f
                y[k, : len(l)] = l
                fl[k] = f.shape[0]
                ll[k] = len(l)
            yield Batch(feats=x, feat_len=fl, labels=y, label_len=ll)
