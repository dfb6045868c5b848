"""Task API tests: gym tuple, crash/truncation/auto-reset semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag


@pytest.fixture(scope="module")
def task():
    return ag.task_registry.make_task("position_setpoint_task", num_envs=16, seed=5)


def test_reset_returns_gym_tuple(task):
    obs, r, term, trunc, info = task.reset()
    assert obs["observations"].shape == (16, 13)
    assert r.shape == (16,) and term.shape == (16,) and trunc.shape == (16,)


def test_obs_layout(task):
    task.reset()
    obs, *_ = task.step(jnp.zeros((16, 4)))
    o = np.asarray(obs["observations"])
    st = task.state
    # [0:3] = target(0) - pos
    np.testing.assert_allclose(o[:, 0:3], -np.asarray(st.pos), atol=1e-5)
    np.testing.assert_allclose(o[:, 3:7], np.asarray(st.quat), atol=1e-5)


def test_crash_beyond_8m(task):
    task.reset()
    st = task.state
    task.state = st.replace(pos=st.pos.at[:, 0].set(20.0))
    obs, r, term, trunc, info = task.step(jnp.zeros((16, 4)))
    assert int(np.asarray(term).sum()) == 16
    np.testing.assert_allclose(np.asarray(r), -20.0)
    # auto-reset happened: new positions within bounds
    assert np.abs(np.asarray(task.state.pos)).max() < 5.0


def test_truncation_resets_steps(task):
    task.reset()
    st = task.state
    task.state = st.replace(sim_steps=jnp.full_like(st.sim_steps, 1000))
    obs, r, term, trunc, info = task.step(jnp.zeros((16, 4)))
    assert int(np.asarray(trunc).sum()) == 16
    assert int(np.asarray(task.state.sim_steps).max()) == 0


def test_reward_increases_near_target(task):
    task.reset()
    st = task.state
    near = st.replace(pos=jnp.full_like(st.pos, 0.05),
                      linvel=jnp.zeros_like(st.linvel),
                      angvel=jnp.zeros_like(st.angvel))
    task.state = near
    _, r_near, *_ = task.step(jnp.zeros((16, 4)))
    st = task.state
    far = st.replace(pos=jnp.full_like(st.pos, 3.0),
                     linvel=jnp.zeros_like(st.linvel),
                     angvel=jnp.zeros_like(st.angvel))
    task.state = far
    _, r_far, *_ = task.step(jnp.zeros((16, 4)))
    assert float(r_near.mean()) > float(r_far.mean())


def test_registry_listing():
    assert "position_setpoint_task" in ag.task_registry.get_task_names()


def test_return_state_before_reset_obs_semantics():
    """return_state_before_reset=True returns the PRE-reset observation of
    crashed envs (reference position_setpoint_task.py:169-181 True path);
    the default False returns the post-reset obs."""
    cfg = ag.task_registry.get_task_config("position_setpoint_task")
    cfg.num_envs = 8
    cfg.return_state_before_reset = True
    t = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                   task_config=cfg)
    t.reset()
    st = t.state
    t.state = st.replace(pos=st.pos.at[:, 0].set(20.0))
    obs, r, term, trunc, info = t.step(jnp.zeros((8, 4)))
    assert int(np.asarray(term).sum()) == 8
    # obs[0:3] = target - pos: reflects the crashed 20 m position...
    assert np.abs(np.asarray(obs["observations"])[:, 0]).min() > 10.0
    # ...while the carried state has already auto-reset into bounds
    assert np.abs(np.asarray(t.state.pos)).max() < 5.0


def test_return_state_before_reset_variant():
    from aerial_gym_simulator_tpu.tasks.position_setpoint_variants import (
        Sim2RealConfig)
    cfg = Sim2RealConfig()
    cfg.num_envs = 8
    cfg.return_state_before_reset = True
    t = ag.task_registry.make_task("position_setpoint_task_sim2real",
                                   num_envs=8, task_config=cfg)
    t.reset()
    carry = t._carry
    # teleport beyond the 10 m crash distance
    t._carry = carry._replace(
        sim=carry.sim.replace(pos=carry.sim.pos.at[:, 0].set(30.0)))
    obs, r, term, trunc, info = t.step(jnp.zeros((8, 4)))
    assert int(np.asarray(term).sum()) == 8
    assert np.abs(np.asarray(obs["observations"])[:, 0]).min() > 15.0


def test_return_state_before_reset_navigation():
    """Camera navigation: True path returns pre-reset obs with the
    previous step's latents (reference navigation_task.py:309)."""
    cfg = ag.task_registry.get_task_config("navigation_task")
    cfg.num_envs = 2
    cfg.return_state_before_reset = True
    t = ag.task_registry.make_task("navigation_task", num_envs=2,
                                   task_config=cfg)
    t.reset()
    ns = t.nav_state
    sim = ns.sim.replace(
        sim_steps=jnp.full_like(ns.sim.sim_steps, 10_000),
        pos=jnp.zeros_like(ns.sim.pos),
        linvel=jnp.zeros_like(ns.sim.linvel))
    t.nav_state = ns.replace(sim=sim)
    target_before = np.asarray(ns.target_position)
    latents_before = np.asarray(ns.latents)
    obs, r, term, trunc, info = t.step(jnp.zeros((2, 4), jnp.float32))
    assert int(np.asarray(trunc).sum()) == 2
    o = np.asarray(obs["observations"])
    np.testing.assert_allclose(
        o[:, 3], np.linalg.norm(target_before, axis=-1), atol=0.5)
    np.testing.assert_allclose(o[:, 17:], latents_before, atol=1e-6)
