"""Test rig: force the CPU backend with 8 virtual devices (the fake-backend
story the torch reference lacks — SURVEY.md section 4 implication (c)).

Note: the hosting environment pins JAX_PLATFORMS to a TPU plugin via
sitecustomize, so plain env vars are not enough — we must override through
jax.config before any backend client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from vfm_vae_tpu.parallel import make_mesh

    return make_mesh()
