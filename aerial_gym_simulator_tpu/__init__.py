"""aerial_gym_simulator_tpu — TPU-native aerial robotics simulation framework.

A from-scratch JAX/XLA/Pallas re-architecture with the capabilities of the
Aerial Gym Simulator (reference: ntnu-arl/aerial_gym_simulator): massively
parallel multirotor simulation, geometric controllers, ray-cast exteroceptive
sensors, randomized obstacle environments, RL task suite and PPO training —
designed for TPU device meshes (SPMD over jax.sharding) instead of a single
CUDA GPU.

Importing the package registers all built-in sims/envs/robots/controllers/
tasks by name (same composition semantics as the reference's registry layer).
"""

__version__ = "0.1.0"

import jax as _jax

# TPU defaults f32 matmuls to bf16 MXU passes; physics/rendering rotation
# math needs true f32 (0.2% bf16 error breaks trajectory parity). The
# matmuls here are tiny 3x3 rotations and small MLPs — the MXU speed
# difference is irrelevant; kernels that want bf16 opt in locally.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent jit cache for every surface (tasks, examples, training): the
# fused navigation programs take minutes to compile cold; repeat runs load
# from disk. Config updates do not initialize the XLA backend. Override the
# location with AERIAL_GYM_TPU_JIT_CACHE (empty string disables).
import os as _os


def _default_jit_cache_dir() -> str:
    """Persistent-cache dir FINGERPRINTED by the host CPU feature set.

    XLA:CPU persists AOT-compiled machine code; loading an entry compiled
    with different target features is undefined behavior (cpu_aot_loader
    warns "could lead to execution errors such as SIGILL" — and a stale
    shared cache dir did segfault the CPU test suite). Keying the dir on
    the cpuinfo flags makes any feature mismatch select a fresh dir.
    """
    import hashlib
    tag = "generic"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    tag = hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
    except OSError:
        pass
    return f"/tmp/aerial_gym_tpu_jit_cache_{tag}"


_cache_dir = _os.environ.get("AERIAL_GYM_TPU_JIT_CACHE",
                             _default_jit_cache_dir())
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the persistent cache

from .registry.registries import (  # noqa: F401
    controller_registry,
    env_config_registry,
    robot_registry,
    sim_config_registry,
    task_registry,
)

# import-time registration (reference: package __init__ registration pattern)
from .config import register_all as _register_configs  # noqa: E402
from .tasks import register_all as _register_tasks  # noqa: E402

_register_configs()
_register_tasks()

from .sim.sim_builder import SimBuilder  # noqa: F401, E402
