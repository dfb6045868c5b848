"""Controller tuning harness (reference examples/tune_controllers.py).

Measures step-response metrics — rise time, settling time, overshoot,
steady-state error — for each Lee controller axis over the whole env batch,
so gain ranges can be tuned against quantitative targets instead ofeyeballing
the viewer.

Beyond the reference: ``--grad`` tunes the position/velocity gains by
GRADIENT DESCENT through the differentiable rollout (env_step is pure JAX,
so d(step-response cost)/d(gains) is exact reverse-mode AD — impossible
against the reference's closed PhysX binary, whose tuning loop can only
sample-and-measure).
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


def rest_state(env):
    """The step-response initial condition: at rest at the origin."""
    st = env.state
    n = st.pos.shape[0]
    return st.replace(
        pos=jnp.zeros_like(st.pos),
        quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (n, 1)),
        linvel=jnp.zeros_like(st.linvel), angvel=jnp.zeros_like(st.angvel),
        motor_thrust=jnp.zeros_like(st.motor_thrust))


def sim_dt(params):
    """Env-step duration (physics dt x control-rate decimation)."""
    return float(params.dt) * params.env.substep_mean


def run_axis(controller, axis, target, steps, num_envs, robot):
    env = SimBuilder().build_env("base_sim", "empty_env", robot, controller,
                                 num_envs=num_envs, seed=0)
    env.reset()
    env.state = rest_state(env)

    n_act = env.params.controller.num_actions
    action = np.zeros((num_envs, n_act), np.float32)
    action[:, axis] = target
    if controller == "lee_attitude_control":
        action[:, 0] = 0.0          # zero-offset thrust command hovers
    action = jnp.asarray(action)

    trace = []
    dt = sim_dt(env.params)
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


def grad_tune(robot: str, steps: int = 120, iters: int = 150,
              lr: float = 0.03, num_envs: int = 4):
    """Gradient-optimize Lee position/velocity gains through the rollout.

    Cost = time-weighted squared tracking error of a [1, 0, 1] m position
    step + an overshoot penalty; gains are optimized in log space (positive
    by construction). Returns (tuned K_pos, tuned K_vel).
    """
    import jax
    import optax

    from aerial_gym_simulator_tpu.sim.dynamics import env_step

    env = SimBuilder().build_env("base_sim", "empty_env", robot,
                                 "lee_position_control",
                                 num_envs=num_envs, seed=0)
    env.reset()
    st0 = rest_state(env)
    params = env.params
    target = jnp.array([1.0, 0.0, 1.0])
    action = jnp.tile(jnp.array([[1.0, 0, 1.0, 0]], jnp.float32),
                      (num_envs, 1))

    def response(kp, kv):
        st = st0.replace(K_pos=jnp.tile(kp, (num_envs, 1)),
                         K_vel=jnp.tile(kv, (num_envs, 1)))

        def body(st, _):
            st = env_step(params, st, action)
            return st, st.pos

        _, pos = jax.lax.scan(body, st, None, length=steps)
        return pos  # (T, N, 3)

    def cost(log_g):
        g = jax.tree_util.tree_map(jnp.exp, log_g)
        pos = response(g["kp"], g["kv"])
        err = pos - target
        w = jnp.linspace(0.2, 1.0, steps)[:, None, None]  # settling-weighted
        overshoot = jnp.maximum(pos - target, 0.0)
        return jnp.mean(w * err ** 2) + 4.0 * jnp.mean(overshoot ** 2)

    kp0, kv0 = jnp.asarray(st0.K_pos[0]), jnp.asarray(st0.K_vel[0])
    log_g = {"kp": jnp.log(kp0), "kv": jnp.log(kv0)}
    opt = optax.adam(lr)
    opt_state = opt.init(log_g)

    @jax.jit
    def update(lg, os_):
        c, grads = jax.value_and_grad(cost)(lg)
        upd, os_ = opt.update(grads, os_)
        return optax.apply_updates(lg, upd), os_, c

    c0 = float(cost(log_g))
    for it in range(iters):
        log_g, opt_state, c = update(log_g, opt_state)
        if it % 30 == 0:
            print(f"  grad-tune iter {it:4d} cost {float(c):.4f}")
    g = jax.tree_util.tree_map(jnp.exp, log_g)

    t = np.arange(steps) * sim_dt(params)
    for name, kp, kv in [("catalog", kp0, kv0), ("tuned", g["kp"], g["kv"])]:
        z = np.asarray(response(kp, kv)[:, :, 2].mean(axis=1))
        m = step_response_metrics(t, z, 1.0)
        print(f"  {name:8s} K_pos {np.asarray(kp).round(2)} "
              f"K_vel {np.asarray(kv).round(2)} | z-step rise "
              f"{m['rise_time']:.3f}s overshoot {m['overshoot_pct']:.1f}% "
              f"settle {m['settling_time']:.3f}s sse "
              f"{m['steady_state_error']:.4f}")
    print(f"  cost {c0:.4f} -> {float(c):.4f} "
          f"({c0 / max(float(c), 1e-9):.1f}x)")
    return g["kp"], g["kv"]


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default="base_quadrotor")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--grad", action="store_true",
                   help="gradient-descend position/velocity gains through "
                        "the differentiable rollout before measuring")
    p.add_argument("--grad_iters", type=int, default=150)
    args = p.parse_args()

    if args.grad:
        print(f"gradient gain tuning ({args.robot}):")
        grad_tune(args.robot, iters=args.grad_iters)
        print()

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
