"""Controller tuning harness (reference examples/tune_controllers.py).

Measures step-response metrics — rise time, settling time, overshoot,
steady-state error — for each Lee controller axis over the whole env batch,
so gain ranges can be tuned against quantitative targets instead ofeyeballing
the viewer.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def step_response_metrics(t, y, target, tol=0.05):
    """Classic step metrics from a (T,) response trace."""
    y = np.asarray(y, np.float64)
    yf = target
    rng = abs(yf) if abs(yf) > 1e-6 else 1.0
    # rise time: 10% -> 90%
    try:
        t10 = t[np.argmax(y >= 0.1 * yf)]
        t90 = t[np.argmax(y >= 0.9 * yf)]
        rise = t90 - t10
    except Exception:
        rise = float("nan")
    overshoot = max(0.0, (np.max(y) - yf) / rng) * 100.0
    settled = np.abs(y - yf) <= tol * rng
    # last time it was NOT settled
    not_settled = np.where(~settled)[0]
    settling = t[not_settled[-1]] + (t[1] - t[0]) if len(not_settled) else 0.0
    sse = abs(np.mean(y[-max(len(y) // 10, 1):]) - yf)
    return dict(rise_time=rise, overshoot_pct=overshoot,
                settling_time=settling, steady_state_error=sse)


def run_axis(controller, axis, target, steps, num_envs, robot):
    env = SimBuilder().build_env("base_sim", "empty_env", robot, controller,
                                 num_envs=num_envs, seed=0)
    env.reset()
    # start from rest at origin
    st = env.state
    st = st.replace(
        pos=jnp.zeros_like(st.pos),
        quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (num_envs, 1)),
        linvel=jnp.zeros_like(st.linvel), angvel=jnp.zeros_like(st.angvel),
        motor_thrust=jnp.zeros_like(st.motor_thrust))
    env.state = st

    n_act = env.params.controller.num_actions
    action = np.zeros((num_envs, n_act), np.float32)
    action[:, axis] = target
    if controller == "lee_attitude_control":
        action[:, 0] = 0.0          # zero-offset thrust command hovers
    action = jnp.asarray(action)

    trace = []
    dt = float(env.params.dt) * env.params.env.substep_mean
    for _ in range(steps):
        env.step(action)
        s = env.state
        if controller == "lee_position_control":
            y = s.pos[:, axis]
        elif controller == "lee_velocity_control":
            from aerial_gym_simulator_tpu.control.controllers import compute_robot_obs
            y = compute_robot_obs(s.pos, s.quat, s.linvel, s.angvel).vehicle_linvel[:, axis]
        elif controller == "lee_attitude_control":
            from aerial_gym_simulator_tpu.utils.math import get_euler_xyz_tensor, ssa
            y = ssa(get_euler_xyz_tensor(s.quat))[:, axis - 1]  # axis 1->roll
        else:
            from aerial_gym_simulator_tpu.control.controllers import compute_robot_obs
            y = compute_robot_obs(s.pos, s.quat, s.linvel, s.angvel).body_angvel[:, axis - 1]
        trace.append(np.asarray(y.mean()))
    t = np.arange(steps) * dt
    return t, np.asarray(trace)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default="base_quadrotor")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=400)
    args = p.parse_args()

    cases = [
        ("lee_position_control", 0, 1.0, "x position -> 1 m"),
        ("lee_position_control", 2, 1.0, "z position -> 1 m"),
        ("lee_velocity_control", 0, 1.0, "x velocity -> 1 m/s"),
        ("lee_attitude_control", 1, 0.2, "roll -> 0.2 rad"),
    ]
    print(f"robot={args.robot}  envs={args.num_envs}  ({args.steps} steps)")
    for controller, axis, target, label in cases:
        t, y = run_axis(controller, axis, target, args.steps,
                        args.num_envs, args.robot)
        m = step_response_metrics(t, y, target)
        print(f"{label:28s} rise {m['rise_time']:6.3f}s  "
              f"overshoot {m['overshoot_pct']:5.1f}%  "
              f"settle {m['settling_time']:6.3f}s  "
              f"sse {m['steady_state_error']:.4f}")
