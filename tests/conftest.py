"""Test harness config: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the driver's
dryrun_multichip contract)."""

import os

# force-override: the sandbox's sitecustomize registers the axon TPU plugin
# and pins JAX_PLATFORMS before any env/conftest code runs, so plain env
# vars are ignored — override through jax.config instead (must happen
# before the first backend use)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_small():
    from ansel_tpu.io.synthetic import synth_raw

    return synth_raw(h=128, w=160)


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
