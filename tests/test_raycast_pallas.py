"""Differential test: Pallas TPU kernel (interpret mode) vs the plain-JAX
ray-cast oracle (ops/raycast.py), covering the scalar broad-phase culling
paths (in-range, boundary, parked-at--1000 primitives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.ops import raycast, raycast_pallas as rp
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def _render_both(env, max_range=10.0):
    """Cast the same rays through the oracle and the interpret-mode kernel."""
    params, state = env.params, env.state
    sc = params.scene
    N = state.pos.shape[0]
    # modest ray table (one 32x128 tile after padding)
    H, W = 8, 128
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    ro = state.pos
    quat = state.quat

    from aerial_gym_simulator_tpu.utils.math import quat_rotate
    rd_world = quat_rotate(quat[:, None, :], dirs[None, :, :])
    t_ref, sem_ref = raycast.raycast_batched(
        sc, state.obstacle_pos, state.obstacle_quat, ro, rd_world, max_range)

    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    ones = jnp.ones((dirs.shape[0],), jnp.float32)
    t_pal, sem_pal = rp.raycast_pallas(
        rp.pack_pose(ro, quat), prims, dirs, ones,
        sc.n_box, sc.n_cyl, sc.n_sph, float(max_range), interpret=True)
    return (np.asarray(t_ref), np.asarray(sem_ref),
            np.asarray(t_pal), np.asarray(sem_pal))


@pytest.fixture(scope="module")
def obstacle_env():
    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor", "lee_velocity_control",
                                 num_envs=3, seed=7)
    env.reset()
    return env


def test_pallas_matches_oracle_full_scene(obstacle_env):
    t_ref, sem_ref, t_pal, sem_pal = _render_both(obstacle_env)
    np.testing.assert_allclose(t_pal, t_ref, atol=2e-3)
    hit = t_ref < raycast.NO_HIT_RAY_VAL * 0.9
    assert hit.any()
    assert (sem_pal[hit] == sem_ref[hit]).mean() > 0.999


def test_pallas_matches_oracle_with_culled_obstacles(obstacle_env):
    """Curriculum-parked obstacles (-1000) must be skipped identically by
    the broad phase and the oracle's miss test."""
    env = obstacle_env
    state = env.state
    A = state.obstacle_pos.shape[1]
    # park the last half of the obstacle slots far away
    parked = state.obstacle_pos.at[:, A // 2:, :].set(-1000.0)
    env.state = state.replace(obstacle_pos=parked)
    try:
        t_ref, sem_ref, t_pal, sem_pal = _render_both(env)
    finally:
        env.state = state
    np.testing.assert_allclose(t_pal, t_ref, atol=2e-3)


def test_pallas_boundary_primitive():
    """A primitive straddling max_range + bound must agree with the oracle
    (broad-phase boundary)."""
    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor", "lee_velocity_control",
                                 num_envs=2, seed=3)
    env.reset()
    state = env.state
    # move the robot so obstacles sit near the 10 m reach boundary
    env.state = state.replace(pos=state.pos + jnp.array([[-9.0, 0.0, 0.0]]))
    t_ref, sem_ref, t_pal, sem_pal = _render_both(env)
    np.testing.assert_allclose(t_pal, t_ref, atol=2e-3)


def test_pallas_depth_only_matches_seg_variant(obstacle_env):
    """want_seg=False must produce identical depth (and None seg) — the
    depth-only fast path used by the fused navigation steps."""
    from aerial_gym_simulator_tpu.ops import raycast_pallas as rp
    params, state = obstacle_env.params, obstacle_env.state
    sc = params.scene
    H, W = 8, 128
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    d = np.stack([np.ones_like(xs), xs, ys], axis=-1).reshape(-1, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    ones = jnp.ones((dirs.shape[0],), jnp.float32)
    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    pose = rp.pack_pose(state.pos, state.quat)
    t_seg, sem = rp.raycast_pallas(pose, prims, dirs, ones, sc.n_box,
                                   sc.n_cyl, sc.n_sph, 10.0, interpret=True)
    t_dep, sem_none = rp.raycast_pallas(pose, prims, dirs, ones, sc.n_box,
                                        sc.n_cyl, sc.n_sph, 10.0,
                                        want_seg=False, interpret=True)
    assert sem_none is None
    np.testing.assert_array_equal(np.asarray(t_dep), np.asarray(t_seg))
