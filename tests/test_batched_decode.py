"""Batched multi-stream decode == per-stream decode, including divergent
lengths, emission counts, and row resets."""

import numpy as np
import pytest

from trt_asr_tpu.config import ModelConfig
from trt_asr_tpu.decode import init_decode_state, prime_decode_state, tdt_greedy_decode_chunk
from trt_asr_tpu.decode.batched import reset_decode_state_rows, tdt_greedy_decode_batch
from trt_asr_tpu.decode.tdt_greedy import DecodeState
from trt_asr_tpu.models.parakeet import init_params, offline_encode


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny()
    return cfg, init_params(cfg, seed=4)


def _row_state(state: DecodeState, i: int) -> DecodeState:
    return DecodeState(g=state.g[i : i + 1], h=state.h[:, i : i + 1],
                       c=state.c[:, i : i + 1], y_id=state.y_id[i : i + 1],
                       time_carry=state.time_carry[i : i + 1])


def test_batched_matches_single(setup, rng):
    cfg, params = setup
    b = 3
    feats = (0.6 * rng.standard_normal((b, 160, cfg.feat_in))).astype(np.float32)
    lengths = np.array([160, 111, 57], np.int32)
    enc, t_enc = offline_encode(params, cfg, feats, lengths)
    enc, t_enc = np.asarray(enc), np.asarray(t_enc).astype(np.int32)
    max_tokens = 8 * enc.shape[1]

    st = prime_decode_state(params, cfg, init_decode_state(cfg, b), [])
    toks_b, n_b, st_out = tdt_greedy_decode_batch(
        params, cfg, enc, t_enc, st, max_tokens=max_tokens)
    toks_b, n_b = np.asarray(toks_b), np.asarray(n_b)

    for i in range(b):
        sti = prime_decode_state(params, cfg, init_decode_state(cfg, 1), [])
        toks_s, n_s, st_s = tdt_greedy_decode_chunk(
            params, cfg, enc[i], t_enc[i], sti, max_tokens=max_tokens)
        want = [int(x) for x in np.asarray(toks_s)[: int(n_s)]]
        got = [int(x) for x in toks_b[i, : n_b[i]]]
        assert got == want, f"stream {i}: {got} != {want}"
        np.testing.assert_allclose(np.asarray(st_out.g)[i], np.asarray(st_s.g)[0],
                                   atol=1e-5)
        assert int(np.asarray(st_out.time_carry)[i]) == int(np.asarray(st_s.time_carry)[0])
    assert n_b.max() > 0


def test_row_reset(setup, rng):
    cfg, params = setup
    b = 2
    feats = (0.6 * rng.standard_normal((b, 100, cfg.feat_in))).astype(np.float32)
    enc, t_enc = offline_encode(params, cfg, feats, np.array([100, 100], np.int32))
    enc, t_enc = np.asarray(enc), np.asarray(t_enc).astype(np.int32)

    st = prime_decode_state(params, cfg, init_decode_state(cfg, b), [])
    _, _, st = tdt_greedy_decode_batch(params, cfg, enc, t_enc, st, max_tokens=64)
    # reset row 0 only
    st2 = reset_decode_state_rows(params, cfg, st, np.array([True, False]), [])
    fresh = prime_decode_state(params, cfg, init_decode_state(cfg, b), [])
    np.testing.assert_allclose(np.asarray(st2.g)[0], np.asarray(fresh.g)[0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(st2.h)[:, 1], np.asarray(st.h)[:, 1], atol=0)
    assert int(np.asarray(st2.y_id)[0]) == cfg.blank_id
    assert int(np.asarray(st2.y_id)[1]) == int(np.asarray(st.y_id)[1])


def test_per_step_regime_matches_blank_run(rng):
    """The large-B*T per-step decode regime (b*tq > 256) must be
    token-exact with the blank-run regime on identical inputs."""
    import jax.numpy as jnp

    from trt_asr_tpu.decode import init_decode_state
    from trt_asr_tpu.decode.batched import tdt_greedy_decode_batch

    cfg = ModelConfig.tiny()
    params = init_params(cfg, seed=11)
    b, t = 4, 30
    enc = jnp.asarray(rng.standard_normal((b, t, cfg.d_model)).astype(np.float32))
    t_enc = jnp.asarray(np.array([30, 23, 30, 17], np.int32))

    # b*t=120 <= 128: blank-run regime
    toks_a, n_a, _ = tdt_greedy_decode_batch(
        params, cfg, enc, t_enc, init_decode_state(cfg, b),
        max_tokens=cfg.max_symbols_per_timestep * t)
    # pad T with masked steps so b*t=280 > 128: per-step regime, same valid work
    enc_pad = jnp.pad(enc, ((0, 0), (0, 40), (0, 0)))
    toks_b, n_b, _ = tdt_greedy_decode_batch(
        params, cfg, enc_pad, t_enc, init_decode_state(cfg, b),
        max_tokens=cfg.max_symbols_per_timestep * t)
    assert np.array_equal(np.asarray(n_a), np.asarray(n_b))
    na = np.asarray(n_a)
    for i in range(b):
        assert np.array_equal(np.asarray(toks_a)[i, :na[i]],
                              np.asarray(toks_b)[i, :na[i]]), f"row {i}"
