"""Backend probing without paying the jax import cost on CPU-only runs.

CLI tools dispatch between native-host and device compute paths. Importing
jax costs ~1.5s per process; when the environment pins JAX_PLATFORMS=cpu
(bench subprocesses, test re-exec, production CPU hosts) the answer is known
without importing it.
"""

from __future__ import annotations

import os
import sys


def is_tpu_backend() -> bool:
    """True when jax's default backend is a TPU; avoids importing jax when
    the environment already pins the CPU platform."""
    if "jax" not in sys.modules:
        if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
            return False
    import jax
    return jax.default_backend() == "tpu"


_TUNNELED: bool | None = None


def is_tunneled_backend() -> bool:
    """True when the TPU is reached through a network tunnel (the 'axon'
    PJRT relay) rather than directly attached.

    Device↔host transfer cost through the tunnel is orders of magnitude
    above PCIe, so auto device-dispatch policies that depend on fetching
    sizable results (coverage arrays, pileup counts) stay on the host
    there — measured in BASELINE.md round 4."""
    global _TUNNELED
    if _TUNNELED is None:
        if not is_tpu_backend():
            _TUNNELED = False
        else:
            import jax.extend as jex
            try:
                ver = jex.backend.get_backend().platform_version
            except Exception:  # noqa: BLE001 — conservative default
                ver = ""
            _TUNNELED = "axon" in ver
    return _TUNNELED
