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
