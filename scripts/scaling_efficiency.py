#!/usr/bin/env python
"""Scaling-efficiency rehearsal CLI (BASELINE ">=80% at N>=2 hosts").

Runs the same sharded PPO train step at 1 and N processes on this machine
(CPU + gloo), computes aggregate env-steps/s and weak-scaling efficiency,
and prints ONE JSON line. This rehearses the measurement harness; the
number it prints on CPU is NOT a TPU perf claim. On a real pod, run
`python -m aerial_gym_simulator_tpu.parallel.scaling` per host instead
(see that module's docstring).

Usage:
    python scripts/scaling_efficiency.py [--processes 2] [--local_devices 2]
        [--task position_setpoint_task] [--envs_per_device 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aerial_gym_simulator_tpu.parallel.scaling import (  # noqa: E402
    run_rehearsal, run_strong_rehearsal)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("--task", default="position_setpoint_task")
    ap.add_argument("--envs_per_device", type=int, default=64)
    ap.add_argument("--horizon", type=int, default=16)
    ap.add_argument("--timed_iters", type=int, default=20)
    ap.add_argument("--strong", action="store_true",
                    help="strong scaling: same total envs both legs — the "
                         "mode a shared-core host can sanity-check "
                         "(weak-scaling efficiency there measures only "
                         "core contention)")
    ap.add_argument("--total_envs", type=int, default=128,
                    help="global workload for --strong")
    args = ap.parse_args()
    if args.strong:
        run_strong_rehearsal(num_processes=args.processes,
                             local_devices=args.local_devices,
                             task_name=args.task,
                             total_envs=args.total_envs,
                             horizon=args.horizon,
                             timed_iters=args.timed_iters)
    else:
        run_rehearsal(num_processes=args.processes,
                      local_devices=args.local_devices, task_name=args.task,
                      envs_per_device=args.envs_per_device,
                      horizon=args.horizon, timed_iters=args.timed_iters)


if __name__ == "__main__":
    main()
