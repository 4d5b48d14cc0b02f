"""Test rig: force the CPU backend with 8 virtual devices (the fake-backend
story the torch reference lacks — SURVEY.md section 4 implication (c)).

Note: the hosting environment pins JAX_PLATFORMS to a TPU plugin via
sitecustomize, so plain env vars are not enough — we must override through
jax.config before any backend client is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
    # The concurrency-optimized thunk scheduler executes independent
    # collectives in per-device nondeterministic order, which can
    # cross-deadlock the virtual-CPU in-process rendezvous (see
    # __graft_entry__.dryrun_multichip). Deterministic order for tests.
    flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from vfm_vae_tpu.parallel import make_mesh

    return make_mesh()
