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
