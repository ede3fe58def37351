"""TDT loss vs brute-force path enumeration on tiny lattices."""

import numpy as np
import pytest

from trt_asr_tpu.train import tdt_loss


def brute_force_nll(logits, labels, t_len, u_len, durs, ths, blank):
    """Enumerate all paths: from (t, u), t < t_len, emit label (u<u_len) or
    blank (d>0); termination when u == u_len and t >= t_len."""
    lp_tok = logits[..., :ths] - _lse(logits[..., :ths])
    lp_dur = logits[..., ths:] - _lse(logits[..., ths:])

    from functools import lru_cache

    import sys
    sys.setrecursionlimit(10000)

    def paths(t, u):
        """Total log-prob of completing from (t, u)."""
        if u == u_len and t >= t_len:
            return 0.0
        if t >= t_len:
            return -np.inf  # ran out of audio with labels remaining
        terms = []
        for di, d in enumerate(durs):
            # label emission
            if u < u_len:
                lp = lp_tok[t, u, labels[u]] + lp_dur[t, u, di]
                terms.append(lp + paths(t + d, u + 1))
            # blank emission (d > 0 only)
            if d > 0:
                lp = lp_tok[t, u, blank] + lp_dur[t, u, di]
                terms.append(lp + paths(t + d, u))
        terms = [x for x in terms if np.isfinite(x)]
        if not terms:
            return -np.inf
        m = max(terms)
        return m + np.log(sum(np.exp(np.asarray(terms) - m)))

    return -paths(0, 0)


def _lse(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


@pytest.mark.parametrize("t_len,u_len,durs", [
    (3, 2, (0, 1, 2)),
    (4, 0, (0, 1, 2)),
    (5, 3, (0, 1, 2, 3, 4)),
    (2, 2, (1, 2)),        # no duration-0
])
def test_tdt_loss_matches_brute_force(t_len, u_len, durs):
    rng = np.random.default_rng(t_len * 10 + u_len)
    ths, ndur = 6, len(durs)
    blank = ths - 1
    t_max, u_max = t_len + 1, max(u_len, 1)   # test padding robustness
    logits = rng.standard_normal((1, t_max, u_max + 1, ths + ndur)).astype(np.float32)
    labels = rng.integers(0, blank, size=(1, u_max)).astype(np.int32)

    got = float(np.asarray(tdt_loss(
        logits, labels, np.array([t_len], np.int32), np.array([u_len], np.int32),
        duration_values=durs, token_head_size=ths, blank_id=blank))[0])
    want = brute_force_nll(logits[0], labels[0], t_len, u_len, durs, ths, blank)
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tdt_loss_batched():
    rng = np.random.default_rng(0)
    durs, ths, blank = (0, 1, 2, 3, 4), 8, 7
    b, t_max, u_max = 3, 6, 4
    logits = rng.standard_normal((b, t_max, u_max + 1, ths + len(durs))).astype(np.float32)
    labels = rng.integers(0, blank, size=(b, u_max)).astype(np.int32)
    t_len = np.array([6, 4, 5], np.int32)
    u_len = np.array([4, 2, 0], np.int32)

    vals = np.asarray(tdt_loss(logits, labels, t_len, u_len, duration_values=durs,
                               token_head_size=ths, blank_id=blank))
    assert vals.shape == (b,) and np.isfinite(vals).all() and (vals > 0).all()
    # batched == per-example
    for i in range(b):
        solo = float(np.asarray(tdt_loss(
            logits[i:i+1], labels[i:i+1], t_len[i:i+1], u_len[i:i+1],
            duration_values=durs, token_head_size=ths, blank_id=blank))[0])
        np.testing.assert_allclose(vals[i], solo, rtol=1e-5, atol=1e-5)


def test_tdt_loss_grad():
    """Gradient through the scan-based lattice.

    Runs in a SUBPROCESS: grad-of-scan XLA-CPU compiles are the class
    that has segfaulted this environment's compiler when reached late in
    the ~250-test suite process (the same process-state-dependent crash
    that subprocess-isolated the remat test, tests/test_training.py and
    docs/DEBUGGING.md trap #6; this test hit it once in round 4 at suite
    position ~80%, fine alone)."""
    import os
    import subprocess
    import sys

    code = """
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from trt_asr_tpu.train import tdt_loss

rng = np.random.default_rng(0)
durs, ths, blank = (0, 1, 2, 3, 4), 8, 7
b, t_max, u_max = 3, 6, 4
logits = rng.standard_normal((b, t_max, u_max + 1, ths + len(durs))).astype(np.float32)
labels = rng.integers(0, blank, size=(b, u_max)).astype(np.int32)
t_len = np.array([6, 4, 5], np.int32)
u_len = np.array([4, 2, 0], np.int32)

def loss_sum(lg):
    return jnp.sum(tdt_loss(lg, labels, t_len, u_len, duration_values=durs,
                            token_head_size=ths, blank_id=blank))

g = np.asarray(jax.grad(loss_sum)(jnp.asarray(logits)))
assert np.isfinite(g).all()
assert np.abs(g).max() > 0
# padding positions get no gradient: t >= t_len for example 1 (t_len=4)
assert np.abs(g[1, 5]).max() < 1e-6
print("OK")
"""
    repo = __file__.rsplit("/tests/", 1)[0]
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=600,
                       env={**os.environ, "JAX_PLATFORMS": "cpu",
                            "PYTHONPATH": repo})
    assert r.returncode == 0, (r.stdout[-300:], r.stderr[-500:])
    assert "OK" in r.stdout
