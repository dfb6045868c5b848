"""Closed-loop dynamics parity: the REFERENCE's shipped rl-games policies
(trained against Isaac Gym / PhysX) must fly in THIS simulator without
retraining.

This is the strongest end-to-end evidence that the TPU-native dynamics
(motor lag -> allocation -> Lee controllers -> 6-DoF integration) match the
reference's observable behavior: a policy fitted to the reference's
closed-loop distribution stays stable and reaches its goal here.
"""

import os

import numpy as np
import pytest

NETS = "/root/reference/aerial_gym/examples/rl_games_example/networks"
pytestmark = pytest.mark.skipif(not os.path.isdir(NETS),
                                reason="reference checkout not present")

import jax.numpy as jnp  # noqa: E402

import aerial_gym_simulator_tpu as ag  # noqa: E402
from aerial_gym_simulator_tpu.sim2real.torch_import import (  # noqa: E402
    import_rl_games_policy,
)
from aerial_gym_simulator_tpu.sim2real.numpy_policy import (  # noqa: E402
    load_policy_npz,
)

# (pth, task, max mean dist-to-goal [m] over the last steps)
CASES = [
    ("attitude_policy.pth", "position_setpoint_task", 0.5),
    ("vel_control_lmf2_direct.pth", "position_setpoint_task_sim2real", 1.2),
    ("acc_command_2_multiplier_disturbance.pth",
     "position_setpoint_task_acceleration_sim2real", 1.5),
    # consumes the 16 joint states -> validates the articulated (morphy
    # flexible-arm) dynamics representation, not just the rigid body
    ("morphy_policy_for_flexible_airframe_joint_aware.pth",
     "position_setpoint_task_morphy", 0.6),
]


@pytest.mark.parametrize("pth,task_name,max_dist", CASES)
def test_shipped_policy_flies_closed_loop(tmp_path, pth, task_name, max_dist):
    npz = str(tmp_path / (pth + ".npz"))
    import_rl_games_policy(os.path.join(NETS, pth), npz)
    policy = load_policy_npz(npz)

    task = ag.task_registry.make_task(task_name, num_envs=8, seed=4)
    obs, *_ = task.reset()
    crashes = 0
    dists = []
    for i in range(120):
        a = policy(np.asarray(obs["observations"]))
        obs, reward, term, trunc, infos = task.step(jnp.asarray(a))
        crashes += int(np.asarray(term).sum())
        if i >= 80:
            dists.append(np.linalg.norm(
                np.asarray(obs["observations"])[:, :3], axis=1).mean())
    assert crashes == 0, f"{pth}: {crashes} crashes"
    assert float(np.mean(dists)) < max_dist, (pth, float(np.mean(dists)))
