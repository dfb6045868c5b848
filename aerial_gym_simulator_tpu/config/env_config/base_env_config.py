"""Environment configs: bounds, substep schedule, collision/reset policy.

Parity with reference aerial_gym/config/env_config/ (empty_env.py,
env_with_obstacles.py, ...). Asset include-maps are configured with
``asset_types`` referencing the asset config catalog.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Tuple


@dataclass
class EnvConfig:
    name: str = "base_env"
    num_envs: int = 64
    num_env_actions: int = 0        # actions consumed by env entities (obstacles)
    env_spacing: float = 1.0
    # control-rate decimation: number of physics substeps per env step is
    # sampled ~ floor(N(mean, std)) each env step (reference
    # env_manager.py:417-425)
    num_physics_steps_per_env_step_mean: int = 1
    num_physics_steps_per_env_step_std: float = 0.0
    collision_force_threshold: float = 0.010   # [N]
    reset_on_collision: bool = True
    create_ground_plane: bool = False
    sample_timestep_for_latency: bool = True
    perturb_observations: bool = True
    keep_same_env_for_num_episodes: int = 1
    use_warp: bool = False          # kept for API parity; TPU build always ray-casts
    render_viewer_every_n_steps: int = 10
    # randomized per-env world bounds: actual bounds are sampled uniformly in
    # [lower_bound_min, lower_bound_max] and [upper_bound_min, upper_bound_max]
    # at every reset (reference IGE_env_manager.py:46-64)
    lower_bound_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    lower_bound_max: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    upper_bound_min: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    upper_bound_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    # obstacle asset catalog: {asset_type_name: num_assets}; empty = no obstacles
    include_asset_type: Dict[str, bool] = field(default_factory=dict)
    asset_counts: Dict[str, int] = field(default_factory=dict)


@dataclass
class EmptyEnvConfig(EnvConfig):
    """Reference: config/env_config/empty_env.py (1 physics step per env
    step; num_envs=3 — always overridden by the task/builder)."""
    name: str = "empty_env"
    num_envs: int = 3
    num_physics_steps_per_env_step_mean: int = 1
    num_physics_steps_per_env_step_std: float = 0.0
    collision_force_threshold: float = 0.010
    reset_on_collision: bool = True


@dataclass
class EmptyEnv2MsConfig(EmptyEnvConfig):
    """Reference: config/env_config/env_config_2ms.py — 5 physics substeps
    per env step (10 ms control interval at the 2 ms sim dt)."""
    name: str = "empty_env_2ms"
    num_physics_steps_per_env_step_mean: int = 5
    num_physics_steps_per_env_step_std: float = 0.0
