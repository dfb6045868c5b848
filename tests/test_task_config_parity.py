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
