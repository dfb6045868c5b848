"""Minimal standalone-sim loop (reference examples/position_control_example.py).

Builds an env directly through SimBuilder (no Task) and flies the quad to a
sequence of position setpoints with the geometric Lee position controller.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--viewer", choices=["web", "live"], default=None,
                    help="web: browser viewer at --port; live: matplotlib")
    ap.add_argument("--port", type=int, default=8750)
    ap.add_argument("--num_envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    num_envs = args.num_envs
    env = SimBuilder().build_env(
        sim_name="base_sim",
        env_name="empty_env",
        robot_name="base_quadrotor",
        controller_name="lee_position_control",
        num_envs=num_envs,
        seed=0,
    )
    env.reset()

    if args.viewer:
        # interactive viewer around the same env: random position setpoints
        rng = np.random.RandomState(0)
        setpoint = {"a": jnp.zeros((num_envs, 4), jnp.float32), "i": 0}

        def action_fn(state):
            setpoint["i"] += 1
            if setpoint["i"] % 200 == 1:
                t = rng.uniform(-1.0, 1.0, size=(num_envs, 3))
                y = rng.uniform(-np.pi, np.pi, size=(num_envs, 1))
                setpoint["a"] = jnp.asarray(
                    np.concatenate([t, y], axis=1), jnp.float32)
            return setpoint["a"]

        if args.viewer == "web":
            from aerial_gym_simulator_tpu.viewer import WebViewer
            WebViewer(env, action_fn=action_fn).run(port=args.port,
                                                    max_steps=args.steps)
        else:
            from aerial_gym_simulator_tpu.viewer import LiveViewer
            LiveViewer(env, action_fn=action_fn).run(max_steps=args.steps)
        raise SystemExit(0)

    # actions = [x, y, z, yaw] world-frame position setpoint
    actions = jnp.zeros((num_envs, 4), jnp.float32)
    for i in range(1000):
        if i % 200 == 0:
            # new random setpoint for every env
            target = np.random.uniform(-1.0, 1.0, size=(num_envs, 3))
            yaw = np.random.uniform(-np.pi, np.pi, size=(num_envs, 1))
            actions = jnp.asarray(np.concatenate([target, yaw], axis=1),
                                  jnp.float32)
            print(f"step {i}: new setpoints, first env -> "
                  f"{np.asarray(actions[0])}")
        env.step(actions)
        if i % 200 == 199:
            err = jnp.linalg.norm(env.state.pos - actions[:, :3], axis=-1)
            print(f"step {i}: mean position error {float(err.mean()):.3f} m")
