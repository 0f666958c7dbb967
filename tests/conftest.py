"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware (SURVEY.md §4(d)). Must run before jax
import anywhere in the test process."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets axon (TPU); tests run CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start; override it back before any backend initializes
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)
