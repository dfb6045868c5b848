"""Profiling utilities (SURVEY 5.1 build equivalent).

The reference's only shipped profiling is a wall-clock FPS loop and NVTX
remnants; here the TPU-native toolkit is first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-viewable trace of the wrapped region,
  * ``Stopwatch`` — phase timing with explicit ``block_until_ready`` fences
    so device work is attributed to the right phase,
  * ``measure_steps`` — env-steps/s/chip for any step callable.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax

from .logging import CustomLogger

logger = CustomLogger("profiling")


@contextlib.contextmanager
def trace(logdir: str = "/tmp/aerial_gym_tpu_trace"):
    """jax.profiler trace of the enclosed region (view with TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {logdir}")


class Stopwatch:
    """Named phase timer with device fences.

    with sw.phase("render", fence=pixels): ...
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def fence(self, x):
        """Block on device values inside a phase to attribute their time."""
        jax.block_until_ready(x)

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:8.3f}s total  {1e3 * t / n:8.3f} ms/call"
                         f"  ({n} calls)")
        return "\n".join(lines)


def measure_steps(step_fn: Callable, state, actions, steps: int = 100,
                  warmup: int = 10, fence=lambda s: s):
    """env-steps/s/chip of a (state, actions) -> state callable."""
    for _ in range(warmup):
        state = step_fn(state, actions)
    jax.block_until_ready(fence(state))
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state, actions)
    jax.block_until_ready(fence(state))
    dt = time.perf_counter() - t0
    num_envs = actions.shape[0]
    total = steps * num_envs
    per_chip = total / dt / max(jax.device_count(), 1)
    return {"env_steps_per_s": total / dt,
            "env_steps_per_s_per_chip": per_chip,
            "wall_s": dt, "state": state}


def op_breakdown(trace_dir: str, iters: int = 1, top_k: int = 20):
    """Parse a jax.profiler trace into a per-op device-time table.

    Sums XLA-op event durations from the xplane proto (the same data the
    TensorBoard profile plugin renders) and returns [(name, ms_per_iter,
    fraction)] sorted by cost. `iters` = how many identical iterations the
    traced region contained, so the table reads in ms per iteration.
    """
    import glob

    from jax.profiler import ProfileData

    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    pd = ProfileData.from_file(files[-1])
    totals: Dict[str, float] = {}
    for plane in pd.planes:
        for line in plane.lines:
            # device planes expose per-op events under an "XLA Ops" line
            # (TPU and GPU; the CPU backend does not emit one)
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                totals[ev.name] = totals.get(ev.name, 0.0) + ev.duration_ns
    s = sum(totals.values())
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]
    return [(name, ns / iters / 1e6, (ns / s if s else 0.0))
            for name, ns in rows], s / iters / 1e6


def _main():
    """CLI: trace one jitted task step at scale and print where device
    time goes.

        python -m aerial_gym_simulator_tpu.utils.profiling \
            --task navigation_task --num_envs 1024 --iters 10

    The reference's only profiling tool is a wall-clock FPS loop
    (examples/benchmark.py:67-84); this is the TPU-native equivalent of
    its abandoned NVTX annotations (warp_cam.py:1) done properly.
    """
    import argparse
    import tempfile

    import jax.numpy as jnp

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=1024)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--top", type=int, default=20)
    p.add_argument("--ppo", action="store_true",
                   help="trace a full PPO train iteration (rollout scan + "
                        "GAE + update) instead of one env step")
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--trace_dir", default=None,
                   help="keep the TensorBoard-viewable trace here")
    args = p.parse_args()

    import aerial_gym_simulator_tpu as ag

    task = ag.task_registry.make_task(args.task, num_envs=args.num_envs,
                                      seed=0)

    if args.ppo:
        from ..rl.ppo import PPOConfig, PPOTrainer

        cfg = PPOConfig(num_envs=args.num_envs, horizon=args.horizon,
                        minibatch_size=min(8192,
                                           args.num_envs * args.horizon),
                        seed=0)
        trainer = PPOTrainer(task, cfg)
        unit_steps = args.num_envs * args.horizon

        def step_once(_carry, _actions):
            (trainer.train_state, trainer.env_carry, trainer.obs,
             trainer.key, trainer.norm, metrics) = trainer._train_step(
                trainer.train_state, trainer.env_carry, trainer.obs,
                trainer.key, trainer.norm)
            return None, (metrics["reward_mean"],)

        carry, actions = None, None
        _, rest = step_once(None, None)   # warmup/compile
        jax.block_until_ready(rest[0])
        label = f"{args.task} PPO iteration"
    else:
        task.reset()
        step_fn, carry, _obs = task.make_step_fn()
        step = jax.jit(step_fn, donate_argnums=(0,))
        actions = jnp.zeros(
            (args.num_envs, task.task_config.action_space_dim), jnp.float32)
        unit_steps = args.num_envs

        def step_once(c, a):
            c, *rest = step(c, a)
            return c, rest

        out = step(carry, actions)
        jax.block_until_ready(out[1])
        carry = out[0]
        label = f"{args.task} env step"

    t0 = time.perf_counter()
    for _ in range(args.iters):
        carry, rest = step_once(carry, actions)
    jax.block_until_ready(rest[0])
    wall = (time.perf_counter() - t0) / args.iters

    tdir = args.trace_dir or tempfile.mkdtemp(prefix="agtpu_prof_")
    with trace(tdir):
        for _ in range(args.iters):
            carry, rest = step_once(carry, actions)
        jax.block_until_ready(rest[0])

    rows, total_ms = op_breakdown(tdir, iters=args.iters, top_k=args.top)
    print(f"\n{label} @ {args.num_envs} envs: "
          f"{wall * 1e3:.2f} ms wall "
          f"({unit_steps / wall / 1e3:.1f}k env-steps/s), "
          f"{total_ms:.2f} ms summed device ops "
          f"(> wall when DMA overlaps compute)\n")
    print(f"{'ms/step':>9}  {'share':>6}  op")
    for name, ms, frac in rows:
        print(f"{ms:9.3f}  {100 * frac:5.1f}%  {name[:100]}")


if __name__ == "__main__":
    _main()
