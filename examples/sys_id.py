"""Motor-model system identification harness (reference examples/sys_id.py +
sim2real/motorid_utilities/): generates the sim motor step response as CSV
for comparison against real motor test-bench data, for both Euler and RK4
integration and thrust-/RPM-domain dynamics."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import csv

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.ops.motor_model import motor_step
from aerial_gym_simulator_tpu.sim.params import build_motor_params
from aerial_gym_simulator_tpu.registry.registries import robot_registry


def simulate_step_response(robot_name, scheme, dt, steps, ref_value):
    cfg = robot_registry.make(robot_name)
    cfg.control_allocator_config.motor_model_config.integration_scheme = scheme
    mp = build_motor_params(cfg)
    M = mp.num_motors
    thrust = jnp.zeros((1, M))
    tau_i = jnp.full((1, M), mp.tau_inc_min)
    tau_d = jnp.full((1, M), mp.tau_dec_min)
    kt = jnp.full((1, M), (mp.thrust_constant_min + mp.thrust_constant_max) / 2)
    ref = jnp.full((1, M), ref_value)
    out = []
    for i in range(steps):
        thrust = motor_step(mp, dt, ref, thrust, tau_i, tau_d, kt)
        out.append(float(thrust[0, 0]))
    return np.asarray(out)


def fit_time_constants(times, thrusts):
    """Fit asymmetric first-order time constants from a measured motor
    step trace (the reference's motorid workflow,
    sim2real/motorid_utilities/motor_model_identification.ipynb): split the
    trace into rising/falling segments against the steady levels and
    least-squares fit tau on log(1 - normalized response)."""
    times = np.asarray(times, np.float64)
    thrusts = np.asarray(thrusts, np.float64)
    lo, hi = thrusts.min(), thrusts.max()
    grad = np.gradient(thrusts, times)
    # exclude settled plateaus from BOTH segments: near-zero-gradient
    # samples carry no time-constant information and would anchor the
    # falling fit at a plateau timestamp
    moving = np.abs(grad) > 0.05 * np.abs(grad).max()
    rising = (grad > 0) & moving

    def fit(mask, target, start):
        t = times[mask]
        y = thrusts[mask]
        if len(t) < 4 or abs(target - start) < 1e-9:
            return float("nan")
        u = 1.0 - (y - start) / (target - start)
        # drop converged samples: the settled tail carries no slope
        # information and (clipped) would bias the fit
        keep = u > 1e-3
        if keep.sum() < 4:
            return float("nan")
        t, u = t[keep], u[keep]
        # log(u) = -(t - t0)/tau  ->  slope = -1/tau
        A = np.vstack([t - t[0], np.ones_like(t)]).T
        slope, _ = np.linalg.lstsq(A, np.log(u), rcond=None)[0]
        return -1.0 / slope if slope < 0 else float("nan")

    tau_inc = fit(rising, hi, lo)
    tau_dec = fit((grad < 0) & moving, lo, hi)
    return tau_inc, tau_dec


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--robot", default="base_quadrotor")
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--ref_thrust", type=float, default=1.5)
    p.add_argument("--out", default="/tmp/motor_step_response.csv")
    p.add_argument("--fit", default=None, metavar="CSV",
                   help="fit tau_inc/tau_dec from a measured time,thrust "
                        "CSV (motor test-bench trace) instead of simulating")
    args = p.parse_args()

    if args.fit:
        with open(args.fit) as f:
            first = f.readline()
        try:                       # header sniff: skip only if non-numeric
            float(first.split(",")[0])
            skip = 0
        except ValueError:
            skip = 1
        rows = np.loadtxt(args.fit, delimiter=",", skiprows=skip)
        ti, td = fit_time_constants(rows[:, 0], rows[:, 1])
        print(f"fitted tau_inc={ti:.4f}s tau_dec={td:.4f}s from {args.fit}")
        raise SystemExit(0)

    euler = simulate_step_response(args.robot, "euler", args.dt, args.steps,
                                   args.ref_thrust)
    rk4 = simulate_step_response(args.robot, "rk4", args.dt, args.steps,
                                 args.ref_thrust)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["t", "thrust_euler", "thrust_rk4"])
        for i in range(args.steps):
            w.writerow([i * args.dt, euler[i], rk4[i]])
    # analytic first-order response for reference
    tau = 0.04
    t63 = np.argmax(rk4 >= (1 - np.exp(-1)) * args.ref_thrust) * args.dt
    print(f"wrote {args.out}")
    print(f"63% time: {t63:.3f}s (configured tau ~ {tau}s domain-dependent)")
    print(f"final: euler {euler[-1]:.4f}  rk4 {rk4[-1]:.4f}  "
          f"ref {args.ref_thrust}")
