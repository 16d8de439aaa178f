"""Multi-chip sharding dry-run, isolated in a subprocess so the 8 virtual
CPU devices don't share this process's single-device XLA runtime (8 async
devices on a 2-core host can starve the pool mid-suite)."""

import os
import subprocess
import sys


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon TPU plugin out
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('MULTICHIP_OK')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MULTICHIP_OK" in r.stdout
