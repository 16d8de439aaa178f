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
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # TPU compiles are expensive (20-160 s/shape through the tunnel);
        # persist executables so reruns of the lane/bench/tools reuse them
        enable_compilation_cache()
    return on_tpu


_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Configure jax's persistent compilation cache (VERDICT r4 item 7).

    First compile through the tunnel costs 20-160 s per shape; with the
    persistent cache a second run of the TPU lane or bench reuses the
    serialized executables.  Returns the cache dir in use.  Safe to call
    multiple times and before/after jax import (it only sets config)."""
    global _CACHE_ENABLED
    cache_dir = (cache_dir
                 or os.environ.get("NGSBITS_JAX_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "ngsbits_tpu", "jax_cache"))
    if _CACHE_ENABLED:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every executable, however small/fast — lane shapes are tiny
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _CACHE_ENABLED = True
    return cache_dir


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
