"""Differential data parity of the task configs vs the REFERENCE.

Compares composition names (sim/env/robot/controller), dimensions, episode
lengths, target-sampling ratios, curriculum constants and the full
reward-parameter dictionaries against the reference's own task_config
modules (imported standalone).
"""

import importlib
import os
import sys
import types

import pytest

REFC = "/root/reference/aerial_gym/config"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFC),
                                reason="reference checkout not present")


@pytest.fixture(scope="module")
def ref_task_cfgs():
    ag = sys.modules.setdefault("aerial_gym", types.ModuleType("aerial_gym"))
    if not hasattr(ag, "AERIAL_GYM_DIRECTORY"):
        ag.AERIAL_GYM_DIRECTORY = "/root/reference"
        ag.__path__ = [os.path.dirname(REFC)]
    for pkg, p in [("aerial_gym.config", REFC),
                   ("aerial_gym.config.task_config", REFC + "/task_config")]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [p]
            sys.modules[pkg] = m
    out = {}
    for name in ("position_setpoint_task_config", "navigation_task_config",
                 "lidar_navigation_task_config", "radar_navigation_task_config"):
        out[name] = importlib.import_module(
            "aerial_gym.config.task_config." + name).task_config
    return out


def _common_asserts(ref, ours):
    assert ours.sim_name == ref.sim_name
    assert ours.env_name == ref.env_name
    assert ours.robot_name == ref.robot_name
    assert ours.controller_name == ref.controller_name
    assert ours.observation_space_dim == ref.observation_space_dim
    assert ours.action_space_dim == ref.action_space_dim
    assert ours.episode_len_steps == ref.episode_len_steps
    assert ours.num_envs == ref.num_envs


def _reward_dict_asserts(ref, ours, skip=()):
    for k, v in ref.reward_parameters.items():
        if k in skip:
            continue
        assert k in ours.reward_parameters, k
        ov = ours.reward_parameters[k]
        if isinstance(v, (list, tuple)):
            assert list(ov) == pytest.approx(list(v)), k
        else:
            assert float(ov) == pytest.approx(float(v)), k


def test_position_task_config(ref_task_cfgs):
    from aerial_gym_simulator_tpu.tasks.position_setpoint_task import (
        PositionSetpointTaskConfig)
    ref = ref_task_cfgs["position_setpoint_task_config"]
    ours = PositionSetpointTaskConfig()
    _common_asserts(ref, ours)
    _reward_dict_asserts(ref, ours)


def test_navigation_task_config(ref_task_cfgs):
    from aerial_gym_simulator_tpu.tasks.navigation_task import (
        NavigationTaskConfig)
    ref = ref_task_cfgs["navigation_task_config"]
    ours = NavigationTaskConfig()
    _common_asserts(ref, ours)
    _reward_dict_asserts(ref, ours)
    assert list(ours.target_min_ratio) == pytest.approx(list(ref.target_min_ratio))
    assert list(ours.target_max_ratio) == pytest.approx(list(ref.target_max_ratio))
    for f in ("min_level", "max_level", "check_after_log_instances",
              "increase_step", "decrease_step", "success_rate_for_increase",
              "success_rate_for_decrease"):
        assert getattr(ours.curriculum, f) == pytest.approx(
            getattr(ref.curriculum, f)), f


@pytest.mark.parametrize("which", ["lidar", "radar"])
def test_lidar_radar_task_config(ref_task_cfgs, which):
    from aerial_gym_simulator_tpu.tasks.lidar_navigation_task import (
        LidarNavigationTaskConfig, RadarNavigationTaskConfig)
    if which == "lidar":
        ref = ref_task_cfgs["lidar_navigation_task_config"]
        ours = LidarNavigationTaskConfig()
    else:
        ref = ref_task_cfgs["radar_navigation_task_config"]
        ours = RadarNavigationTaskConfig()
    _common_asserts(ref, ours)
    _reward_dict_asserts(ref, ours)
    assert list(ours.target_min_ratio) == pytest.approx(list(ref.target_min_ratio))
    assert list(ours.target_max_ratio) == pytest.approx(list(ref.target_max_ratio))
    for f in ("min_level", "max_level", "check_after_log_instances",
              "increase_step", "decrease_step", "success_rate_for_increase",
              "success_rate_for_decrease"):
        assert getattr(ours.curriculum, f) == pytest.approx(
            getattr(ref.curriculum, f)), f


# ---------------------------------------------------------------------------
# sim2real / end-to-end / px4 / morphy / reconfigurable variant configs
# (reference config/task_config/position_setpoint_task_*_config.py)
# ---------------------------------------------------------------------------

# our factory name -> (reference module, fields the reference defines)
VARIANT_REF_MODULES = {
    "Sim2RealConfig": "position_setpoint_task_sim2real_config",
    "AccelerationSim2RealConfig":
        "position_setpoint_task_acceleration_sim2real_config",
    "EndToEndConfig": "position_setpoint_task_sim2real_end_to_end_config",
    "Px4Config": "position_setpoint_task_sim2real_px4_config",
    "ReconfigurableConfig": "position_setpoint_task_config_reconfigurable",
    "MorphyConfig": "position_setpoint_task_morphy_config",
}


@pytest.fixture(scope="module")
def ref_variant_cfgs(ref_task_cfgs):
    """Import the reference variant config modules standalone.

    Needs two shims: aerial_gym.utils.math.torch_interpolate_ratio (morphy/
    reconfigurable configs import it) and a device-stripping torch.ones (the
    end_to_end/px4 configs build their action-limit tensors on "cuda:0" at
    class-definition time)."""
    torch = pytest.importorskip("torch")
    # aerial_gym.utils.math stub: only torch_interpolate_ratio is imported
    if "aerial_gym.utils" not in sys.modules:
        u = types.ModuleType("aerial_gym.utils")
        u.__path__ = []
        sys.modules["aerial_gym.utils"] = u
    if "aerial_gym.utils.math" not in sys.modules:
        m = types.ModuleType("aerial_gym.utils.math")

        def torch_interpolate_ratio(min, max, ratio):
            return min + (max - min) * ratio

        m.torch_interpolate_ratio = torch_interpolate_ratio
        sys.modules["aerial_gym.utils.math"] = m

    real_ones = torch.ones

    def cpu_ones(*a, **k):
        k.pop("device", None)
        return real_ones(*a, **k)

    out = {}
    torch.ones = cpu_ones
    try:
        for modname in set(VARIANT_REF_MODULES.values()):
            out[modname] = importlib.import_module(
                "aerial_gym.config.task_config." + modname).task_config
    finally:
        torch.ones = real_ones
    return out


@pytest.mark.parametrize("factory_name", sorted(VARIANT_REF_MODULES))
def test_variant_task_config_matches_reference(ref_variant_cfgs, factory_name):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    ref = ref_variant_cfgs[VARIANT_REF_MODULES[factory_name]]
    ours = getattr(V, factory_name)()
    assert ours.seed == ref.seed
    assert ours.sim_name == ref.sim_name
    assert ours.env_name == ref.env_name
    assert ours.robot_name == ref.robot_name
    assert ours.controller_name == ref.controller_name
    assert ours.num_envs == ref.num_envs
    assert ours.observation_space_dim == ref.observation_space_dim
    assert ours.action_space_dim == ref.action_space_dim
    assert ours.episode_len_steps == ref.episode_len_steps
    if hasattr(ref, "crash_dist"):
        assert ours.crash_dist == pytest.approx(ref.crash_dist)
    if hasattr(ref, "num_joints"):
        assert ours.num_joints == ref.num_joints
    if hasattr(ref, "num_motors"):
        assert ours.num_motors == ref.num_motors
    if hasattr(ref, "action_limit_min"):
        import numpy as np
        ref_lo = np.asarray(
            ref.action_limit_min.numpy()
            if hasattr(ref.action_limit_min, "numpy") else ref.action_limit_min,
            dtype=np.float32)
        ref_hi = np.asarray(
            ref.action_limit_max.numpy()
            if hasattr(ref.action_limit_max, "numpy") else ref.action_limit_max,
            dtype=np.float32)
        np.testing.assert_allclose(np.asarray(ours.action_limit_min), ref_lo)
        np.testing.assert_allclose(np.asarray(ours.action_limit_max), ref_hi)


@pytest.mark.parametrize("factory_name",
                         [n for n in sorted(VARIANT_REF_MODULES)
                          if n not in ("Sim2RealConfig",
                                       "AccelerationSim2RealConfig")])
def test_variant_action_scaling_matches_reference(ref_variant_cfgs,
                                                  factory_name):
    """Execution parity of process_actions_for_task vs our _scale_actions
    (the sim2real/acceleration variants define no action limits — actions
    pass through — so only the four scaling variants are compared)."""
    import numpy as np
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    ref = ref_variant_cfgs[VARIANT_REF_MODULES[factory_name]]
    ours = getattr(V, factory_name)()
    rng = np.random.default_rng(7)
    raw = rng.uniform(-1.5, 1.5, (64, ours.action_space_dim)).astype(np.float32)
    lo = torch.as_tensor(np.asarray(ours.action_limit_min, np.float32))
    hi = torch.as_tensor(np.asarray(ours.action_limit_max, np.float32))
    ref_out = ref.process_actions_for_task(torch.from_numpy(raw.copy()), lo, hi)
    our_out = V._scale_actions(ours, jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               atol=1e-6, rtol=1e-6)


# ---------------------------------------------------------------------------
# action_transformation_function: execution-level parity (the reference
# lambdas are the oracle; they only need torch CPU)
# ---------------------------------------------------------------------------


def test_navigation_action_transform_matches_reference(ref_task_cfgs):
    import numpy as np
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from aerial_gym_simulator_tpu.tasks.navigation_task import (
        NavigationTaskConfig, action_transform)
    ref = ref_task_cfgs["navigation_task_config"]
    ref.device = "cpu"
    rng = np.random.default_rng(11)
    raw = rng.uniform(-1.5, 1.5, (256, 4)).astype(np.float32)
    ref_out = ref.action_transformation_function(torch.from_numpy(raw.copy()))
    our_out = action_transform(NavigationTaskConfig(), jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("which", ["lidar", "radar"])
def test_lidar_action_transform_matches_reference(ref_task_cfgs, which):
    import numpy as np
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from aerial_gym_simulator_tpu.tasks.lidar_navigation_task import (
        LidarNavigationTaskConfig, RadarNavigationTaskConfig, action_transform)
    key = ("lidar_navigation_task_config" if which == "lidar"
           else "radar_navigation_task_config")
    ref = ref_task_cfgs[key]
    ref.device = "cpu"
    ours_cfg = (LidarNavigationTaskConfig() if which == "lidar"
                else RadarNavigationTaskConfig())
    rng = np.random.default_rng(13)
    raw = rng.uniform(-1.5, 1.5, (256, 4)).astype(np.float32)
    ref_out = ref.action_transformation_function(torch.from_numpy(raw.copy()))
    our_out = action_transform(ours_cfg, jnp.asarray(raw))
    np.testing.assert_allclose(np.asarray(our_out), ref_out.numpy(),
                               atol=1e-5, rtol=1e-5)
