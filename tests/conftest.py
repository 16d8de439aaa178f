import os

# Force a virtual 8-device CPU mesh for all tests (multi-chip sharding is
# validated on host; the driver separately dry-runs the real TPU path).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF_DATA = pathlib.Path("/root/reference/src/tools-TEST")


@pytest.fixture
def ref_data_in():
    return REF_DATA / "data_in"


@pytest.fixture
def ref_data_out():
    return REF_DATA / "data_out"
