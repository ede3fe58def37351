"""JAX platform selection for entrypoints.

Reference parity role: the reference selects its compute device with
`ParakeetConfig.device_id` + `cudaSetDevice` at session create
(/root/reference/cpp/parakeet_trt.cpp:1667-1698 provenance logging; the
CLI passes device 0). The JAX analog is the JAX_PLATFORMS env var — but
unlike cudaSetDevice, it can be silently overridden:

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
