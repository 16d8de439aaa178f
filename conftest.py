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


def pytest_configure(config):
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
