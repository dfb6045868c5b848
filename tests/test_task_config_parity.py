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
    _common_asserts(ref_task_cfgs["position_setpoint_task_config"],
                    PositionSetpointTaskConfig())


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
