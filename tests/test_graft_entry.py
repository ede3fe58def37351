"""Driver-gate coverage: dryrun_multichip must work however it's invoked.

Round-1 MULTICHIP gate failed because the driver imports `__graft_entry__`
and calls `dryrun_multichip(8)` directly (no __main__ env setup) — the
function must be self-contained (VERDICT r1, Next #1).
"""

import jax
import pytest


def test_dryrun_multichip_inprocess():
    # conftest gives us an 8-device CPU platform -> in-process path.
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_subprocess_fallback():
    # Ask for more devices than this process has -> subprocess path.
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(16)
