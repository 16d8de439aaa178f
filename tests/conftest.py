import os

# Tests run on host CPU with a SINGLE device: forcing 8 virtual devices on a
# 2-core box wedges XLA's CPU runtime mid-suite (async executions starve each
# other's thread pool). The multi-chip sharding path is validated in its own
# subprocess (tests/test_multichip.py) and by the driver's dryrun_multichip.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

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
