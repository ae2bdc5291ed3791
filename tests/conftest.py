import os
import sys

# Tests run the multi-chip sharding paths on a virtual 8-device CPU mesh
# (standard JAX trick; real-TPU runs happen via bench.py / the driver).
# NB the ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel), so
# override hard — setdefault would silently keep the TPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

REF_BIN = "/root/repo/.refbuild/strawberry"


@pytest.fixture(scope="session")
def reference_binary():
    if not os.path.exists(REF_BIN):
        pytest.skip("reference binary not built (tools/build_reference.sh)")
    return REF_BIN
