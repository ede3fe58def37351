"""JAX platform selection for entrypoints.

TPU-plugin sitecustomizes (e.g. the axon PJRT plugin registered via a
PYTHONPATH sitecustomize) may force their platform at interpreter start
regardless of the JAX_PLATFORMS env var (docs/DEBUGGING.md). Any entrypoint
that honors a caller's platform request — the replay CLI, the embedded
native-backend bridge — must REASSERT the env choice after importing jax,
or CPU-requested runs silently route through the TPU tunnel (one remote
compile per subprocess; this timed out the r3 WER gate's native surface).
"""

from __future__ import annotations

import os


def ensure_requested_platform() -> None:
    """Re-apply the env-requested JAX platform over any sitecustomize
    override; no-op when JAX_PLATFORMS is unset."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
