"""LiDAR / radar navigation task tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.tasks.lidar_navigation_task import (
    DS_SHAPE,
    LidarNavigationTaskConfig,
    action_transform,
    process_pointcloud,
)


def test_action_transform_scaling():
    cfg = LidarNavigationTaskConfig()
    raw = jnp.array([[1.0, -1.0, 0.5, 1.0]])
    out = np.asarray(action_transform(cfg, raw))[0]
    np.testing.assert_allclose(out[:3], [2.0, -2.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(out[3], np.pi / 3, atol=1e-6)


def test_process_pointcloud_range_and_ttc():
    """A wall of points 5 m ahead with the robot flying at it at 2 m/s
    gives TTC ~2.5 s and inverse-range ~1/5."""
    cfg = LidarNavigationTaskConfig()
    N, H, W = 2, 48, 120
    robot_pos = jnp.zeros((N, 3))
    pts = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0]), (N, H, W, 3))
    linvel = jnp.broadcast_to(jnp.array([2.0, 0.0, 0.0]), (N, 3))
    obs, ttc = process_pointcloud(cfg, robot_pos, linvel, pts,
                                  jax.random.PRNGKey(0))
    assert obs.shape == (N, DS_SHAPE[0] * DS_SHAPE[1])
    np.testing.assert_allclose(np.asarray(ttc), 2.5, atol=0.01)
    # majority of pixels should read the true inverse range (noise hits few)
    med = float(jnp.median(obs))
    assert abs(med - 0.2) < 0.02


def test_process_pointcloud_out_of_range_to_max():
    cfg = LidarNavigationTaskConfig()
    N, H, W = 1, 48, 120
    robot_pos = jnp.zeros((N, 3))
    # all points at 0.05 m (below min range) -> treated as max range 10
    pts = jnp.broadcast_to(jnp.array([0.05, 0.0, 0.0]), (N, H, W, 3))
    linvel = jnp.zeros((N, 3))
    obs, ttc = process_pointcloud(cfg, robot_pos, linvel, pts,
                                  jax.random.PRNGKey(1))
    med = float(jnp.median(obs))
    assert abs(med - 0.1) < 0.02          # 1/10
    assert float(ttc[0]) == 10.0          # not closing


def test_radar_mode_sparsity():
    cfg = LidarNavigationTaskConfig()
    cfg.radar_mode = True
    N, H, W = 4, 48, 120
    pts = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0]), (N, H, W, 3))
    obs, _ = process_pointcloud(cfg, jnp.zeros((N, 3)), jnp.zeros((N, 3)),
                                pts, jax.random.PRNGKey(2))
    frac_invalid = float(jnp.mean((obs == -1.0).astype(jnp.float32)))
    assert 0.7 < frac_invalid < 0.9       # ~80% invalid returns


def test_radar_invalid_prob_override_and_anneal():
    """process_pointcloud honors a traced invalid_prob override, and the
    radar task's anneal config ramps the in-step invalid fraction from
    start to the parity 0.8 (training aid; eval defaults stay at parity —
    VERDICT r4 radar item)."""
    cfg = LidarNavigationTaskConfig()
    cfg.radar_mode = True
    N, H, W = 4, 48, 120
    pts = jnp.broadcast_to(jnp.array([5.0, 0.0, 0.0]), (N, H, W, 3))
    obs, _ = process_pointcloud(cfg, jnp.zeros((N, 3)), jnp.zeros((N, 3)),
                                pts, jax.random.PRNGKey(2),
                                invalid_prob=jnp.float32(0.1))
    frac = float(jnp.mean((obs == -1.0).astype(jnp.float32)))
    assert 0.03 < frac < 0.2              # ~10%, not the parity 80%

    # end-to-end: anneal active -> early steps carry dense returns
    t_cfg = ag.task_registry.get_task_config("radar_navigation_task")
    t_cfg.radar_invalid_prob_start = 0.0
    t_cfg.radar_invalid_anneal_env_steps = 10_000_000
    t = ag.task_registry.make_task("radar_navigation_task", num_envs=2,
                                   seed=5, task_config=t_cfg)
    t.reset()
    obs, *_ = t.step(jnp.zeros((2, 4), jnp.float32))
    lid = np.asarray(obs["observations"])[:, 17:]
    early_frac = float((lid == -1.0).mean())
    assert early_frac < 0.1               # dense: anneal barely started
    assert float(t.nav_state.env_steps) == 2.0


@pytest.mark.parametrize("name", ["lidar_navigation_task",
                                  "radar_navigation_task"])
def test_task_runs_and_obs_shape(name):
    t = ag.task_registry.make_task(name, num_envs=2, seed=5)
    t.reset()
    a = jnp.zeros((2, 4), jnp.float32)
    for _ in range(2):
        obs, r, term, trunc, info = t.step(a)
    o = np.asarray(obs["observations"])
    assert o.shape == (2, 13 + 4 + 320)
    assert np.all(np.isfinite(o))
    assert "curriculum_level" in info


def test_return_state_before_reset_lidar():
    """return_state_before_reset=True: obs reflect the pre-reset pose and
    the previous step's lidar features (reference
    lidar_navigation_task.py:386 True path)."""
    cfg = ag.task_registry.get_task_config("lidar_navigation_task")
    cfg.num_envs = 2
    cfg.return_state_before_reset = True
    t = ag.task_registry.make_task("lidar_navigation_task", num_envs=2,
                                   task_config=cfg)
    t.reset()
    ns = t.nav_state
    # force truncation next step; park the robot at a known offset
    sim = ns.sim.replace(
        sim_steps=jnp.full_like(ns.sim.sim_steps, 10_000),
        pos=jnp.zeros_like(ns.sim.pos),
        linvel=jnp.zeros_like(ns.sim.linvel))
    t.nav_state = ns.replace(sim=sim)
    target_before = np.asarray(ns.target_position)
    lidar_before = np.asarray(ns.lidar_obs)
    obs, r, term, trunc, info = t.step(jnp.zeros((2, 4), jnp.float32))
    assert int(np.asarray(trunc).sum()) == 2
    o = np.asarray(obs["observations"])
    # dist slot ~ |target_old - pos_old~0| (robot barely moves in one step)
    np.testing.assert_allclose(
        o[:, 3], np.linalg.norm(target_before, axis=-1), atol=0.5)
    # lidar slots are the PREVIOUS step's features, verbatim
    np.testing.assert_allclose(o[:, 17:], lidar_before, atol=1e-6)
