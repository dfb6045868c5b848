"""Simulation configs (dt, gravity, integration).

Parity with reference aerial_gym/config/sim_config/base_sim_config.py:19-41.
The PhysX solver knobs (solver iterations, contact offsets, GPU buffer sizes)
have no TPU equivalent — the TPU build integrates rigid bodies analytically
inside one jitted step — so only the physically meaningful parameters are
kept: dt, gravity, and integrator selection.
"""

from dataclasses import dataclass, field
from typing import List, Tuple


@dataclass
class ViewerConfig:
    """Offline-render viewer parameters (reference: BaseSimConfig.viewer)."""
    headless: bool = True
    ref_env: int = 0
    camera_position: Tuple[float, float, float] = (-5.0, -5.0, 4.0)
    lookat: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    width: int = 1280
    height: int = 720
    max_range: float = 100.0
    min_range: float = 0.1
    horizontal_fov_deg: float = 90.0


@dataclass
class SimConfig:
    name: str = "base_sim"
    dt: float = 0.01
    substeps: int = 1
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    # semi-implicit (symplectic) Euler matches PhysX's integrator family;
    # rk4 is available for higher-fidelity experiments.
    integrator: str = "semi_implicit_euler"
    # Per-body damping applied by the physics engine itself (reference URDF
    # asset options: angular_damping / linear_damping = 0.01,
    # base_quad_config.py:94-95). Applied as v *= max(0, 1 - c*dt).
    viewer: ViewerConfig = field(default_factory=ViewerConfig)


@dataclass
class BaseSimConfig(SimConfig):
    name: str = "base_sim"
    dt: float = 0.01


@dataclass
class BaseSimHeadlessConfig(SimConfig):
    name: str = "base_sim_headless"
    dt: float = 0.01


@dataclass
class SimConfig2Ms(SimConfig):
    name: str = "base_sim_2ms"
    dt: float = 0.002


@dataclass
class SimConfig4Ms(SimConfig):
    name: str = "base_sim_4ms"
    dt: float = 0.004


@dataclass
class BaseSimNoGravityConfig(SimConfig):
    name: str = "base_sim_no_gravity"
    gravity: Tuple[float, float, float] = (0.0, 0.0, 0.0)


@dataclass
class CustomSimConfig(SimConfig):
    """User-template sim config (reference
    config/sim_config/custom_sim_config.py:8-12: dt=0.001, sideways
    gravity). Registration is left to the user, mirroring the commented
    ``sim_config_registry.register("custom_sim", ...)`` at the
    reference's sim/__init__.py:19-20."""
    name: str = "custom_sim"
    dt: float = 0.001
    gravity: Tuple[float, float, float] = (1.0, 0.0, 0.0)
