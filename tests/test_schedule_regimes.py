"""Schedule-regime generalization, validated against the reference's only
true-NeMo evidence: 200 chunks of real cache-aware streaming schedule
metadata (/root/reference/artifacts/diagnostics/streaming_cache_200.jsonl,
the NeMo-default 592/584 shift-8 cache_drop-72 regime), plus the contract's
cache3 production regime in both chunk-0 semantics
(nemo_compat_chunk0 — see trt_asr_tpu/streaming/schedule.py docstring).

Reference parity target: tools/verify_nemo/streaming_encoder_cache.py
`_build_schedule` (:544-572) and NeMo cache_aware_stream_step bookkeeping.
"""

import json
import os

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.models.parakeet import encode, init_encoder_state, init_params
from trt_asr_tpu.streaming import (
    ChunkScheduler,
    StreamingRegime,
    build_schedule,
    build_schedule_n,
    predict_bookkeeping,
)

META = "/root/reference/artifacts/diagnostics/streaming_cache_200.jsonl"

pytestmark_meta = pytest.mark.skipif(
    not os.path.exists(META), reason="reference NeMo metadata not mounted")


@pytest.fixture(scope="module")
def records():
    if not os.path.exists(META):
        pytest.skip("reference NeMo metadata not mounted")
    with open(META) as f:
        return [json.loads(line) for line in f]


@pytest.fixture(scope="module")
def nemo_regime(records):
    r0, r1 = records[0], records[1]
    cap = r0["cache_shapes_in"]["cache_last_channel"][2]
    return StreamingRegime(
        chunk_sizes=(r0["schedule"]["chunk_size"], r1["schedule"]["chunk_size"]),
        shift_sizes=tuple(r0["shift_size"]),
        pre_encode=tuple(r0["pre_encode_cache_size"]),
        drop_extra=r0["drop_extra_pre_encoded"],
        cache_drop=r0["cache_drop_size"],
        valid_out_len=r0["valid_out_len"],
        capacity=cap,
        nemo_chunk0_drop=True,   # the real export drops on chunk 0 too
    )


def test_schedule_matches_nemo_metadata_all_200(records, nemo_regime):
    """Slice geometry identical to the reference generator's, record for
    record, over the full 200-chunk NeMo-default run."""
    specs = build_schedule_n(len(records), nemo_regime)
    for spec, rec in zip(specs, records):
        s = rec["schedule"]
        assert spec.idx == rec["chunk_idx"]
        assert spec.start == s["start"], spec
        assert spec.slice_start == s["slice_start"], spec
        assert spec.slice_end == s["slice_end"], spec
        assert spec.slice_end - spec.slice_start == rec["input_len"], spec
        r = 0 if spec.idx == 0 else 1
        assert nemo_regime.chunk_sizes[r] == s["chunk_size"]
        assert nemo_regime.shift_sizes[r] == s["shift_size"]
        assert nemo_regime.pre_encode[r] == s["pre_encode"]


def test_bookkeeping_matches_nemo_metadata_all_200(records, nemo_regime):
    """cache_len trajectory + emitted lengths: our pure-python schedule
    oracle reproduces NeMo's bookkeeping on all 200 records. This pins the
    semantics 'drop_extra applies on EVERY chunk' (chunk 0:
    sub(592)=74 - 2 - 72 = 0 kept) and 'cache keeps the first
    post_drop - cache_drop steps'."""
    specs = build_schedule_n(len(records), nemo_regime)
    book = predict_bookkeeping(nemo_regime, specs)
    for b, rec in zip(book, records):
        assert b["input_len"] == rec["input_len"], b
        assert b["cache_len_in"] == rec["cache_len_in"], b
        assert b["cache_len_out"] == rec["cache_len_out"], b
        assert b["enc_len"] == rec["enc_len_post"], b


def test_cache3_bookkeeping_both_chunk0_modes():
    """Production (cache3) regime: nemo_compat chunk 0 keeps 1 cache step
    (ceil(41/8)=6 - drop 2 - cache_drop 3 — matches the reference
    DECISION_LOG 'cache_len_out=1 on chunk 0'); our tiling default keeps 3.
    Both emit valid_out_len=3 per chunk."""
    cfg = ModelConfig()  # full-size constants; schedule math only
    nemo = StreamingRegime.from_config(
        ModelConfig(nemo_compat_chunk0=True))
    ours = StreamingRegime.from_config(cfg)

    specs_n = build_schedule_n(6, nemo)
    specs_o = build_schedule_n(6, ours)
    assert [s.drop_extra for s in specs_n] == [2, 2, 2, 2, 2, 2]
    assert [s.drop_extra for s in specs_o] == [0, 2, 2, 2, 2, 2]
    # identical geometry; the drop is the only difference
    assert [(s.slice_start, s.slice_end) for s in specs_n] == \
           [(s.slice_start, s.slice_end) for s in specs_o]

    book_n = predict_bookkeeping(nemo, specs_n)
    book_o = predict_bookkeeping(ours, specs_o)
    assert [b["cache_len_out"] for b in book_n] == [1, 4, 7, 10, 13, 16]
    assert [b["cache_len_out"] for b in book_o] == [3, 6, 9, 12, 15, 18]
    assert all(b["enc_len"] == 3 for b in book_n + book_o)


def test_tiny_encoder_nemo_regime_cache_len(records, nemo_regime, rng):
    """The real encoder step reproduces the metadata's cache_len trajectory
    end-to-end (not just the pure-python oracle): run the first chunks of
    the NeMo-default regime through encode() on a tiny model."""
    n = 6
    cfg = ModelConfig.tiny(
        att_cache_size=nemo_regime.capacity,
        cache_drop_size=nemo_regime.cache_drop,
        valid_out_len=nemo_regime.valid_out_len,
        drop_extra_pre_encoded=nemo_regime.drop_extra,
        chunk_size_frames=nemo_regime.chunk_sizes,
        shift_size_frames=nemo_regime.shift_sizes,
        pre_encode_cache_size=nemo_regime.pre_encode,
        nemo_compat_chunk0=True,
        num_layers=1, d_model=16, n_heads=2, subsampling_conv_channels=4,
        feat_in=16, pos_emb_max_len=1024,
    )
    params = init_params(cfg, seed=0)
    specs = build_schedule_n(n, nemo_regime)
    total = max(s.slice_end for s in specs)
    feats = (0.1 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)

    state = init_encoder_state(cfg, 1)
    for spec, rec in zip(specs, records[:n]):
        x = feats[spec.slice_start:spec.slice_end]
        assert int(state.cache_len[0]) == rec["cache_len_in"]
        _, out_len, state = encode(
            params, cfg, x[None], np.array([x.shape[0]], np.int32), state,
            drop_extra=spec.drop_extra, cache_drop=nemo_regime.cache_drop,
            valid_cap=nemo_regime.valid_out_len)
        assert int(out_len[0]) == rec["enc_len_post"]
        assert int(state.cache_len[0]) == rec["cache_len_out"], spec


def test_nemo_compat_closed_loop_oracle_parity(rng):
    """Numeric parity of the nemo_compat chunk-0 path: closed-loop
    JAX-vs-torch-oracle over the cache3 schedule with chunk 0 dropping
    (emits 3 steps while caching only 1 — emission/caching decoupled)."""
    cfg = ModelConfig.tiny(nemo_compat_chunk0=True)
    params = init_params(cfg, seed=3)
    from oracle.torch_parakeet import TorchParakeet

    oracle = TorchParakeet(cfg, params)
    total = 170
    feats = (0.5 * rng.standard_normal((total, cfg.feat_in))).astype(np.float32)
    sched = build_schedule(total, cfg)
    assert sched[0].drop_extra == cfg.drop_extra_pre_encoded  # nemo chunk 0

    state = init_encoder_state(cfg, 1)
    lc = np.zeros((1, cfg.num_layers, cfg.att_cache_size, cfg.d_model), np.float32)
    lt = np.zeros((1, cfg.num_layers, cfg.d_model, cfg.conv_context_size), np.float32)
    cache_len = 0
    for spec in sched:
        x = feats[max(spec.slice_start, 0):spec.slice_end]
        if x.shape[0] < spec.frames:
            x = np.pad(x, ((0, spec.frames - x.shape[0]), (0, 0)))
        valid = spec.valid_frames
        cache_drop = 0 if spec.is_last else cfg.cache_drop_size
        enc_j, len_j, state = encode(
            params, cfg, x[None], np.array([valid], np.int32), state,
            drop_extra=spec.drop_extra, cache_drop=cache_drop,
            valid_cap=None if spec.is_last else cfg.valid_out_len)
        enc_t, len_t, lc, lt, cache_len = oracle.streaming_step(
            x[None], valid, lc, lt, cache_len, spec.drop_extra,
            keep_all=spec.is_last)
        assert int(np.asarray(len_j)[0]) == len_t, spec
        if spec.idx == 0:
            assert len_t == 3 and cache_len == 1  # emit 3, cache 1
        got = np.asarray(enc_j)[0, :len_t]
        want = enc_t[0]
        err = float(np.max(np.abs(got - want))) if len_t else 0.0
        assert err < 2e-4, f"chunk {spec.idx}: max err {err:.2e}"
        assert int(state.cache_len[0]) == cache_len


def test_unified_rejects_nemo_compat():
    cfg = ModelConfig.tiny(nemo_compat_chunk0=True)
    with pytest.raises(ValueError):
        ChunkScheduler(cfg, unified=True)
