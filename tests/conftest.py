"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the driver's
dryrun_multichip contract)."""

import os

# force-override: the sandbox exports JAX_PLATFORMS=axon globally, but the
# test suite must be hermetic on a virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_small():
    from ansel_tpu.io.synthetic import synth_raw

    return synth_raw(h=128, w=160)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
