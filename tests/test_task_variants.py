"""Position-setpoint variant tasks: registration, obs shapes, rewards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.tasks.position_setpoint_variants import (
    _morphy_reward,
    _reconfigurable_reward,
    _sim2real_reward,
    matrix_to_rotation_6d,
)

ALL_VARIANTS = [
    ("position_setpoint_task_sim2real", 17, 4),
    ("position_setpoint_task_acceleration_sim2real", 17, 4),
    ("position_setpoint_task_sim2real_end_to_end", 15, 4),
    ("position_setpoint_task_sim2real_px4", 15, 4),
    ("position_setpoint_task_reconfigurable", 49, 16),
    ("position_setpoint_task_morphy", 33, 4),
]


def test_all_variant_tasks_registered():
    names = set(ag.task_registry.get_task_names())
    assert {n for n, _, _ in ALL_VARIANTS} <= names


@pytest.mark.parametrize("name,obs_dim,act_dim", ALL_VARIANTS)
def test_variant_step_shapes_finite(name, obs_dim, act_dim):
    t = ag.task_registry.make_task(name, num_envs=4, seed=1)
    t.reset()
    a = jnp.full((4, act_dim), 0.5, jnp.float32)
    for _ in range(3):
        obs, r, term, trunc, info = t.step(a)
    o = np.asarray(obs["observations"])
    assert o.shape == (4, obs_dim)
    assert np.all(np.isfinite(o))
    assert np.all(np.isfinite(np.asarray(r)))
    assert r.shape == (4,)


def test_sim2real_reward_prefers_progress():
    """Moving toward the goal must out-reward moving away (closer_reward
    term, reference sim2real compute_reward)."""
    pos_err = jnp.array([[1.0, 0.0, 0.0]])
    zero3 = jnp.zeros((1, 3))
    a = jnp.zeros((1, 4))
    r_closer, _ = _sim2real_reward(pos_err, jnp.array([1.5]), jnp.zeros(1),
                                   zero3, zero3, jnp.zeros(1), a, a)
    r_farther, _ = _sim2real_reward(pos_err, jnp.array([0.5]), jnp.zeros(1),
                                    zero3, zero3, jnp.zeros(1), a, a)
    assert float(r_closer[0]) > float(r_farther[0])


def test_sim2real_crash_beyond_10m():
    pos_err = jnp.array([[11.0, 0.0, 0.0]])
    zero3 = jnp.zeros((1, 3))
    a = jnp.zeros((1, 4))
    r, crashes = _sim2real_reward(pos_err, jnp.array([11.0]), jnp.zeros(1),
                                  zero3, zero3, jnp.zeros(1), a, a)
    assert float(crashes[0]) == 1.0
    assert float(r[0]) == -50.0


def test_reconfigurable_crash_on_tilt():
    """Roll or pitch beyond 1 rad crashes (reference reconfigurable task)."""
    level = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    # 1.2 rad roll
    tilted = jnp.array([[np.sin(0.6), 0.0, 0.0, np.cos(0.6)]], jnp.float32)
    pe = jnp.zeros((1, 3))
    w = jnp.zeros((1, 3))
    _, c0 = _reconfigurable_reward(pe, level, w, jnp.zeros(1))
    _, c1 = _reconfigurable_reward(pe, tilted, w, jnp.zeros(1))
    assert float(c0[0]) == 0.0
    assert float(c1[0]) == 1.0


def test_morphy_joint_vel_penalty():
    quat = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    pe = jnp.zeros((1, 3))
    w = jnp.zeros((1, 3))
    a = jnp.full((1, 4), 0.711225)
    still, _ = _morphy_reward(pe, quat, w, jnp.zeros((1, 8)), jnp.zeros(1), a, a)
    waving, _ = _morphy_reward(pe, quat, w, jnp.full((1, 8), 0.5),
                               jnp.zeros(1), a, a)
    assert float(still[0]) > float(waving[0])


def test_rotation_6d_roundtrip_identity():
    from aerial_gym_simulator_tpu.utils.math import quat_to_rotation_matrix
    q = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    r6 = matrix_to_rotation_6d(quat_to_rotation_matrix(q))
    np.testing.assert_allclose(np.asarray(r6)[0],
                               [1, 0, 0, 0, 1, 0], atol=1e-6)


def test_variant_ppo_protocol():
    """make_step_fn contract used by the PPO learner."""
    t = ag.task_registry.make_task("position_setpoint_task_sim2real",
                                   num_envs=4, seed=0)
    step_fn, carry, obs = t.make_step_fn()
    a = jnp.zeros((4, 4), jnp.float32)
    carry, obs2, r, term, trunc = jax.jit(step_fn)(carry, a)
    assert obs2.shape == obs.shape
    assert np.all(np.isfinite(np.asarray(obs2)))
