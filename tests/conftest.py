import os
import sys

# Tests must run on the host CPU backend. In this image a sitecustomize hook
# registers the 'axon' TPU plugin at interpreter start whenever
# PALLAS_AXON_POOL_IPS is set, and once registered it hijacks the backend
# even with JAX_PLATFORMS=cpu — routing every test's jax traffic through the
# single-chip TPU tunnel (slow, and large transfers can wedge the relay).
# The root-level conftest.py re-execs with a cleaned environment — except
# for the on-chip lane (pytest -m tpu), which keeps the real TPU backend.
if not os.environ.get("_NGSBITS_TPU_LANE"):
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
