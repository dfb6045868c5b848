import os

# CPU with 8 virtual devices: fast tests + fake multi-chip mesh for sharding
# tests (standard XLA trick; SURVEY.md section 4 implication list).
# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var, so the
# platform must be forced through jax.config before first device use.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory_between_modules():
    """Free JAX's in-memory executable caches after every test module.

    36 modules x many jitted programs accumulate enough allocator arena
    that the largest compile late in the suite (the fused navigation step)
    aborted with a C++ allocation failure. The persistent on-disk
    compilation cache (fingerprinted, see package __init__) makes the
    re-loads cheap, so clearing per module bounds memory at ~zero rerun
    cost."""
    yield
    jax.clear_caches()
    gc.collect()
