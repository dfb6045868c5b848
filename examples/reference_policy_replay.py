"""Fly a reference-framework-trained rl-games policy in THIS simulator.

The reference ships trained rl-games checkpoints (reference
examples/rl_games_example/networks/*.pth, e.g. ``attitude_policy.pth``
trained on its position_setpoint_task). This simulator's
position_setpoint_task packs the identical 13-d observation
([pos_error, quat, body_linvel, body_angvel], reference
position_setpoint_task.py:195-200) and drives the same lee_attitude
controller, so an imported reference policy flies here closed-loop with
no retraining — the end-to-end migration check.

Run:  python examples/reference_policy_replay.py \\
          --pth <reference>/aerial_gym/examples/rl_games_example/networks/attitude_policy.pth
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse

import numpy as np
import jax.numpy as jnp

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.sim2real import (NumpyPolicy,
                                               import_rl_games_policy)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True,
                   help="reference rl-games checkpoint (.pth)")
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--steps", type=int, default=400)
    args = p.parse_args()

    npz = "/tmp/" + _os.path.basename(args.pth) + ".npz"
    import_rl_games_policy(args.pth, npz)
    policy = NumpyPolicy(npz)

    task = ag.task_registry.make_task(args.task, num_envs=args.num_envs,
                                      seed=0)
    obs, *_ = task.reset()
    assert np.asarray(obs["observations"]).shape[1] == policy.layers[0][0].shape[0], \
        "observation dim mismatch between task and checkpoint"

    total_r, crashes = 0.0, 0
    for i in range(args.steps):
        a = policy(np.asarray(obs["observations"]))
        obs, reward, term, trunc, infos = task.step(jnp.asarray(a))
        total_r += float(reward.mean())
        crashes += int(term.sum())
        if i % 100 == 99:
            d = np.linalg.norm(np.asarray(obs["observations"])[:, :3], axis=1)
            print(f"step {i}: mean reward {total_r/(i+1):.3f} "
                  f"crashes {crashes} mean dist-to-goal {d.mean():.2f} m")
    print(f"replay done: mean step reward {total_r/args.steps:.3f}, "
          f"{crashes} crashes over {args.steps} steps x {args.num_envs} envs")


if __name__ == "__main__":
    main()
