"""Morphy soft-arm step response for sys-id (reference
examples/morphy_soft_arm_example.py).

Drives a ``morphy_fixed_base`` robot (root clamped, arms pinned at 0.29 rad
by the init config — reference MorphyFixedBaseCfg, morphy_config.py:211-225)
with zero thrust in the 2 ms-dt sim, releases the passive arms and logs the
joint step response. The trace is what the reference compares against the
real arm's measured step response (its stored_data/joint_step.csv); pass
``--csv <file>`` with ``time,elevation_deg`` rows to overlay your own
measurement and print the fit error.

Run:  python examples/morphy_soft_arm_example.py [--steps 1500] [--csv f.csv]
"""

import os
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import argparse
import csv
import math

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def read_measurement(filename):
    """time,elevation_deg CSV → (t, theta_rad); skips headers/outliers the
    same way the reference example filters its rosbag export."""
    rows = []
    with open(filename) as f:
        for row in csv.reader(f):
            try:
                t, theta = float(row[0]), float(row[1])
            except (ValueError, IndexError):
                continue
            if t > 0.06 and theta < 15.0:
                rows.append((t, theta * math.pi / 180.0))
    ts = np.array([r[0] for r in rows])
    th = np.array([r[1] for r in rows])
    return ts - ts[0], th


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--num_envs", type=int, default=1)
    ap.add_argument("--csv", type=str,
                    default=(os.path.join(os.path.dirname(__file__),
                                          "stored_data", "joint_step.csv")
                             if os.path.exists(os.path.join(
                                 os.path.dirname(__file__), "stored_data",
                                 "joint_step.csv")) else None),
                    help="measured time,elevation_deg CSV to compare against")
    ap.add_argument("--out", type=str,
                    default="/tmp/morphy_arm_step.csv")
    args = ap.parse_args()

    env = SimBuilder().build_env(
        sim_name="base_sim_2ms", env_name="empty_env_2ms",
        robot_name="morphy_fixed_base", controller_name="no_control",
        num_envs=args.num_envs, seed=0)
    env.reset()

    # zero motor command: arms released from the pinned 0.29 rad init
    actions = jnp.zeros((args.num_envs, env.params.motor.num_motors))
    dt_env = float(env.params.dt) * env.params.env.substep_mean

    times, angles = [], []
    for i in range(args.steps):
        env.step(actions)
        q = np.asarray(env.state.dof_pos)[0]
        times.append((i + 1) * dt_env)
        angles.append(float(q[0]))

    times = np.array(times)
    angles = np.array(angles)
    with open(args.out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["time", "elevation_rad"])
        w.writerows(zip(times, angles))
    print(f"wrote {args.out}: {len(times)} samples, "
          f"theta0={angles[0]:+.4f} -> theta_end={angles[-1]:+.4f} rad, "
          f"overshoot={angles.min():+.4f} rad")

    if args.csv:
        t_m, th_m = read_measurement(args.csv)
        th_sim = np.interp(t_m, times, angles)
        err = np.sqrt(np.mean((th_sim - th_m) ** 2))
        print(f"measured trace: {len(t_m)} samples, RMSE sim-vs-real "
              f"{err:.4f} rad")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.plot(times, np.degrees(angles), label="sim arm response")
        if args.csv:
            plt.plot(t_m, np.degrees(th_m), label="measured", alpha=0.6)
        plt.xlabel("time [s]"); plt.ylabel("arm elevation [deg]")
        plt.legend(); plt.tight_layout()
        png = args.out.rsplit(".", 1)[0] + ".png"
        plt.savefig(png, dpi=120)
        print(f"wrote {png}")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()
