"""In-graph curriculum logic (reference check_and_update_curriculum_level)."""

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.tasks.navigation_task import (
    CurriculumConfig,
    curriculum_update,
)

CUR = CurriculumConfig(min_level=15, max_level=36,
                       check_after_log_instances=100,
                       increase_step=2, decrease_step=1,
                       success_rate_for_increase=0.7,
                       success_rate_for_decrease=0.6)


def _run(level, s, c, t, successes, crashes, timeouts):
    return curriculum_update(
        CUR, jnp.float32(level), jnp.float32(s), jnp.float32(c),
        jnp.float32(t),
        jnp.asarray(successes, jnp.float32), jnp.asarray(crashes, jnp.float32),
        jnp.asarray(timeouts, jnp.float32))


def test_accumulates_below_threshold():
    level, s, c, t = _run(20, 0, 0, 0, [1, 1, 0], [0, 0, 1], [0, 0, 0])
    assert float(level) == 20          # not enough instances yet
    assert float(s) == 2 and float(c) == 1


def test_increase_on_high_success_rate():
    # 80 successes + 20 crashes = 100 instances, rate 0.8 > 0.7 -> +2
    level, s, c, t = _run(20, 79, 20, 0, [1], [0], [0])
    assert float(level) == 22
    assert float(s) == 0 and float(c) == 0   # aggregates reset


def test_decrease_on_low_success_rate():
    level, s, c, t = _run(20, 49, 50, 0, [1], [0], [0])   # rate 0.5 < 0.6
    assert float(level) == 19


def test_hold_in_band():
    level, *_ = _run(20, 64, 35, 0, [1], [0], [0])        # rate 0.65
    assert float(level) == 20


def test_clamped_to_bounds():
    level, *_ = _run(36, 99, 0, 0, [1], [0], [0])
    assert float(level) == 36                              # max
    level, *_ = _run(15, 0, 99, 0, [0], [1], [0])
    assert float(level) == 15                              # min
