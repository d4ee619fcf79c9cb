"""Test harness configuration.

Tests run on a virtual 8-device CPU backend
(``--xla_force_host_platform_device_count=8``) — the JAX-idiomatic way to
exercise multi-chip sharding without hardware (SURVEY.md §4).  Must be set
before jax initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU PJRT plugin and sets
# jax_platforms="axon,cpu"; override to pure CPU for hermetic, fast tests.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs
