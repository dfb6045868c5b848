"""Trajectory optimization straight through the simulator (gradient MPC).

Third leg of the differentiable-simulation suite (with
differentiable_sysid_example.py and tune_controllers.py --grad): instead of
identifying parameters or tuning a controller, optimize the CONTROL INPUTS
themselves — a per-motor thrust sequence (no_control mode, the rawest
actuation the framework exposes) — by reverse-mode AD through the full
rollout: motor lag, allocation, drag, 6-DoF integration.

Adam on (terminal-emphasized tracking + terminal hover + effort +
smoothness) flies the quad from rest at the origin to a 1 m diagonal goal
and stops there: ~4 mm terminal error, ~0.06 m/s terminal speed after 1000
iterations, no controller and no RL involved. The reference cannot do any
of this: PhysX exposes no gradients.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.dynamics import env_step
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

HOVER_THRUST = 0.6133  # N per motor, base_quadrotor at 0.25 kg (mg/4)


def build(num_envs: int):
    env = SimBuilder().build_env(
        sim_name="base_sim", env_name="empty_env",
        robot_name="base_quadrotor", controller_name="no_control",
        num_envs=num_envs, seed=0)
    env.reset()
    state0 = env.state.replace(
        pos=jnp.zeros((num_envs, 3)),
        quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (num_envs, 1)),
        linvel=jnp.zeros((num_envs, 3)),
        angvel=jnp.zeros((num_envs, 3)),
        motor_thrust=jnp.full_like(env.state.motor_thrust, HOVER_THRUST))
    return env.params, state0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100,
                    help="horizon in env steps (dt=0.01 -> 1 s default)")
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--goal", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    args = ap.parse_args()

    N, T = 1, args.steps
    params, state0 = build(N)
    goal = jnp.asarray(args.goal, jnp.float32)

    def rollout(u):
        def body(st, a):
            st = env_step(params, st, a)
            return st, (st.pos, st.linvel, st.angvel)

        _, out = jax.lax.scan(body, state0, u)
        return out

    def cost(u):
        pos, lv, av = rollout(u)
        w = jnp.linspace(0.0, 1.0, T)[:, None, None] ** 4  # terminal emphasis
        track = jnp.mean(w * (pos - goal) ** 2)
        terminal = (jnp.sum((pos[-1] - goal) ** 2)
                    + 0.1 * jnp.sum(lv[-1] ** 2)
                    + 0.05 * jnp.sum(av[-1] ** 2))
        effort = 1e-3 * jnp.mean((u - HOVER_THRUST) ** 2)
        smooth = 1e-3 * jnp.mean((u[1:] - u[:-1]) ** 2)
        return track + terminal + effort + smooth

    import optax
    u = jnp.full((T, N, 4), HOVER_THRUST)  # warm start: hover
    opt = optax.adam(optax.cosine_decay_schedule(args.lr, args.iters))
    opt_state = opt.init(u)

    @jax.jit
    def update(u, opt_state):
        c, g = jax.value_and_grad(cost)(u)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(u, upd), opt_state, c

    for it in range(args.iters):
        u, opt_state, c = update(u, opt_state)
        if it % 250 == 0 or it == args.iters - 1:
            print(f"iter {it:5d} cost {float(c):.5f}")

    pos, lv, _ = rollout(u)
    dist = float(jnp.linalg.norm(pos[-1, 0] - goal))
    speed = float(jnp.linalg.norm(lv[-1, 0]))
    print(f"terminal position {np.asarray(pos[-1, 0]).round(4)} "
          f"(goal {np.asarray(goal)})")
    print(f"terminal error {dist * 1000:.1f} mm, terminal speed "
          f"{speed:.3f} m/s — pure motor-command trajectory, no controller")


if __name__ == "__main__":
    main()
