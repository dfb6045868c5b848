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
