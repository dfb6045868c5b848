"""Gradient-based system identification THROUGH the simulator.

A capability the reference framework cannot offer: its physics core
(PhysX inside Isaac Gym) is a closed binary, so its sys-id tooling fits
closed-form models to logged data outside the simulator (reference
examples/sys_id.py exponential fits, sim2real/motorid_utilities
notebooks). Here the functional core (sim/dynamics.py::env_step) is a
pure JAX function, so an ENTIRE rollout — motor lag, control allocation,
drag wrench, 6-DoF integration — is reverse-mode differentiable, and
unknown physical parameters can be recovered by gradient descent on a
trajectory-matching loss, all jitted on TPU.

This example "measures" a trajectory from a quad with known motor time
constants and linear drag, then recovers both from a deliberately wrong
initial guess by Adam on the mean-squared trajectory error. The same
recipe identifies any SimParams/SimState leaf (inertia, gains, thrust
constants...) from real flight logs.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.dynamics import env_step
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def build(num_envs: int, seed: int = 3):
    env = SimBuilder().build_env(
        sim_name="base_sim",
        env_name="empty_env",
        robot_name="base_quadrotor",
        controller_name="lee_velocity_control",
        num_envs=num_envs,
        seed=seed,
    )
    env.reset()
    return env


def excitation(num_envs: int, steps: int):
    """Sinusoid velocity commands rich enough to excite drag + motor lag."""
    t = np.arange(steps)[:, None, None] * 0.01
    phase = np.arange(num_envs)[None, :, None] * 0.7
    cmd = np.concatenate(
        [1.5 * np.sin(6.0 * t + phase),
         1.0 * np.sin(9.0 * t + 1.3 + phase),
         0.8 * np.sin(4.0 * t + 2.1 + phase),
         0.5 * np.sin(3.0 * t + phase)], axis=2)
    return jnp.asarray(cmd, jnp.float32)


def make_rollout(params, state0, actions_seq):
    """theta -> (T, N, 6) pos+linvel trajectory, differentiable in theta."""

    def apply_theta(theta):
        p = params.replace(robot=params.robot.replace(
            drag_lin_linear=theta["drag"]))
        st = state0.replace(
            motor_tau_inc=jnp.full_like(state0.motor_tau_inc, theta["tau"]),
            motor_tau_dec=jnp.full_like(state0.motor_tau_dec, theta["tau"]))
        return p, st

    def rollout(theta):
        p, st = apply_theta(theta)

        def body(st, a):
            st = env_step(p, st, a)
            return st, jnp.concatenate([st.pos, st.linvel], axis=-1)

        _, traj = jax.lax.scan(body, st, actions_seq)
        return traj

    return rollout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_envs", type=int, default=4)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--lr", type=float, default=0.05)
    args = ap.parse_args()

    env = build(args.num_envs)
    actions = excitation(args.num_envs, args.steps)
    rollout = make_rollout(env.params, env.state, actions)

    # ground truth: the catalog quad's motor tau with a custom drag vector
    true_theta = {"tau": jnp.asarray(0.08),
                  "drag": jnp.asarray([0.15, 0.12, 0.25])}
    measured = jax.jit(rollout)(true_theta)

    # optimize in log space (both parameters are positive by physics)
    def loss_fn(log_theta):
        theta = jax.tree_util.tree_map(jnp.exp, log_theta)
        pred = rollout(theta)
        return jnp.mean((pred - measured) ** 2)

    import optax
    log_theta = jax.tree_util.tree_map(
        jnp.log, {"tau": jnp.asarray(0.025),
                  "drag": jnp.asarray([0.5, 0.5, 0.05])})
    opt = optax.adam(args.lr)
    opt_state = opt.init(log_theta)

    @jax.jit
    def update(log_theta, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(log_theta)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(log_theta, updates), opt_state, loss

    for it in range(args.iters):
        log_theta, opt_state, loss = update(log_theta, opt_state)
        if it % 50 == 0 or it == args.iters - 1:
            th = jax.tree_util.tree_map(jnp.exp, log_theta)
            print(f"iter {it:4d} loss {float(loss):.3e} "
                  f"tau {float(th['tau']):.4f} (true 0.0800) "
                  f"drag {np.asarray(th['drag']).round(3)} "
                  f"(true [0.15 0.12 0.25])")

    th = jax.tree_util.tree_map(jnp.exp, log_theta)
    tau_err = abs(float(th["tau"]) - 0.08)
    drag_err = float(jnp.abs(th["drag"] - true_theta["drag"]).max())
    print(f"recovered: tau within {tau_err:.2e}, drag within {drag_err:.2e}")


if __name__ == "__main__":
    main()
