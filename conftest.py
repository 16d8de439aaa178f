"""Root conftest: re-exec pytest with a clean environment BEFORE jax loads.

This image's sitecustomize registers the 'axon' TPU plugin at interpreter
start whenever PALLAS_AXON_POOL_IPS is set; once registered it hijacks the
jax backend even with JAX_PLATFORMS=cpu, routing all test traffic through
the single-chip TPU tunnel (slow; large transfers can wedge the relay).
The re-exec happens in pytest_configure with fd capture stopped first, so
the replacement process writes to the real stdout.
"""

import os
import sys


def _is_tpu_lane(config) -> bool:
    """True when the run selects the on-chip lane (pytest -m tpu): those
    tests need the real TPU backend, so the CPU re-exec must not happen."""
    import re
    markexpr = config.getoption("-m", default="") or ""
    return (re.search(r"\btpu\b", markexpr) is not None
            and "not tpu" not in markexpr)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: on-chip tests that need the real TPU backend "
                   "(run with: python -m pytest -m tpu tests/)")
    if _is_tpu_lane(config):
        os.environ["_NGSBITS_TPU_LANE"] = "1"
        return
    if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_NGSBITS_REEXEC"):
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["_NGSBITS_REEXEC"] = "1"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
