"""Differential data parity of controller gain configs vs the REFERENCE.

Compares the per-robot Lee-controller gain randomization ranges (K_pos /
K_vel / K_rot / K_angvel min/max), randomize flag, action limits and
num_actions against the reference's controller_config modules.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFC = "/root/reference/aerial_gym/config"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFC),
                                reason="reference checkout not present")

from aerial_gym_simulator_tpu.registry.registries import (  # noqa: E402
    controller_registry,
)
import aerial_gym_simulator_tpu.config  # noqa: F401,E402


@pytest.fixture(scope="module")
def ref_controller_cfgs():
    ag = sys.modules.setdefault("aerial_gym", types.ModuleType("aerial_gym"))
    if not hasattr(ag, "AERIAL_GYM_DIRECTORY"):
        ag.AERIAL_GYM_DIRECTORY = "/root/reference"
        ag.__path__ = [os.path.dirname(REFC)]
    for pkg, p in [("aerial_gym.config", REFC),
                   ("aerial_gym.config.controller_config",
                    REFC + "/controller_config")]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [p]
            sys.modules[pkg] = m
    return {
        name: importlib.import_module(
            "aerial_gym.config.controller_config." + name).control
        for name in ("lee_controller_config", "lee_controller_config_octarotor",
                     "lmf2_controller_config", "magpie_controller_config",
                     "fully_actuated_controller_rov")
    }


# reference gain-config module -> our registered controller names sharing it
PAIRS = {
    "lee_controller_config": [
        "lee_position_control", "lee_velocity_control",
        "lee_attitude_control", "lee_rates_control",
        "lee_acceleration_control", "lee_velocity_steering_angle_control"],
    "lee_controller_config_octarotor": [
        "octarotor_position_control", "octarotor_velocity_control",
        "octarotor_attitude_control", "octarotor_rates_control",
        "octarotor_acceleration_control"],
    "lmf2_controller_config": [
        "lmf2_position_control", "lmf2_velocity_control",
        "lmf2_attitude_control", "lmf2_rates_control",
        "lmf2_acceleration_control"],
    "magpie_controller_config": [
        "magpie_position_control", "magpie_velocity_control",
        "magpie_attitude_control", "magpie_rates_control",
        "magpie_acceleration_control"],
    "fully_actuated_controller_rov": ["rov_fully_actuated_control"],
}


@pytest.mark.parametrize("ref_name", sorted(PAIRS))
def test_controller_gains_match_reference(ref_controller_cfgs, ref_name):
    ref = ref_controller_cfgs[ref_name]
    for our_name in PAIRS[ref_name]:
        ours = controller_registry.make(our_name)
        for f in ("K_pos_tensor_min", "K_pos_tensor_max",
                  "K_vel_tensor_min", "K_vel_tensor_max",
                  "K_rot_tensor_min", "K_rot_tensor_max",
                  "K_angvel_tensor_min", "K_angvel_tensor_max"):
            np.testing.assert_allclose(
                np.asarray(getattr(ours, f), float),
                np.asarray(getattr(ref, f), float), atol=1e-9,
                err_msg=f"{our_name}.{f}")
        assert bool(ours.randomize_params) == bool(ref.randomize_params), \
            our_name
        assert ours.num_actions == ref.num_actions, our_name
        assert float(ours.max_inclination_angle_rad) == pytest.approx(
            float(ref.max_inclination_angle_rad)), our_name
        assert float(ours.max_yaw_rate) == pytest.approx(
            float(ref.max_yaw_rate)), our_name
