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


def test_pallas_normals_match_oracle(obstacle_env):
    """want_normals mode (training-rate NormalFaceID/RGB path) in lockstep
    with the oracle raycast_batched_normals: depth, seg, face id and the
    world-frame surface normal."""
    from aerial_gym_simulator_tpu.utils.math import quat_rotate

    env = obstacle_env
    params, state = env.params, env.state
    sc = params.scene
    H, W = 8, 128
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    # short range: the obstacle env is enclosed, so a 10 m range hits on
    # every ray — 4 m leaves both hits AND misses to differentiate
    max_range = 4.0

    rd_world = quat_rotate(state.quat[:, None, :], dirs[None, :, :])
    t_ref, sem_ref, n_ref, face_ref = raycast.raycast_batched_normals(
        sc, state.obstacle_pos, state.obstacle_quat, state.pos, rd_world,
        max_range)

    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    ones = jnp.ones((dirs.shape[0],), jnp.float32)
    t_pal, sem_pal, n_pal, face_pal = rp.raycast_pallas(
        rp.pack_pose(state.pos, state.quat), prims, dirs, ones,
        sc.n_box, sc.n_cyl, sc.n_sph, float(max_range), want_normals=True,
        n_tri=sc.n_tri, interpret=True)

    t_ref, sem_ref = np.asarray(t_ref), np.asarray(sem_ref)
    n_ref, face_ref = np.asarray(n_ref), np.asarray(face_ref)
    t_pal, sem_pal = np.asarray(t_pal), np.asarray(sem_pal)
    n_pal, face_pal = np.asarray(n_pal), np.asarray(face_pal)

    np.testing.assert_allclose(t_pal, t_ref, atol=2e-3)
    hit = face_ref >= 0
    assert hit.any() and (~hit).any()
    # face ids / seg agree except possibly on razor-thin depth ties
    same_face = face_pal == face_ref
    assert same_face.mean() > 0.995
    assert (sem_pal[hit & same_face] == sem_ref[hit & same_face]).all()
    # misses: face -1, normal exactly zero
    assert (face_pal[~hit] == -1).all()
    assert (n_pal[~hit] == 0.0).all()
    # normals agree where the same primitive won (unit vectors -> atol)
    np.testing.assert_allclose(n_pal[hit & same_face],
                               n_ref[hit & same_face], atol=5e-3)
    # and are unit length on hits
    norms = np.linalg.norm(n_pal[hit], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_pallas_normals_all_kinds_synthetic():
    """One primitive of every kind (box, cylinder, sphere, triangle) at
    known poses: Pallas normals (interpret) vs oracle AND vs hand-computed
    analytic normals."""
    kind = np.array([0, 1, 2, 3], np.int32)
    size = np.array([[1.0, 1.0, 1.0],     # unit box at (4, 0, 0)
                     [0.5, 2.0, 0.0],     # r=.5 h=2 cylinder at (0, 4, 0)
                     [0.7, 0.0, 0.0],     # r=.7 sphere at (-4, 0, 0)
                     [2.0, 0.0, 2.0]],    # right triangle in z=0 plane
                    np.float32)
    pos = np.array([[4.0, 0.0, 0.0], [0.0, 4.0, 0.0],
                    [-4.0, 0.0, 0.0], [-1.0, -4.0, 0.0]], np.float32)
    rot = np.broadcast_to(np.eye(3, dtype=np.float32), (4, 3, 3)).copy()
    sem = np.array([1, 2, 3, 4], np.int32)
    slot = np.zeros((4,), np.int32)

    class _Sc:
        env_prim_slot = jnp.asarray(slot)[None]
        env_prim_kind = jnp.asarray(kind)[None]
        env_prim_size = jnp.asarray(size)[None]
        env_prim_pos = jnp.asarray(pos)[None]
        env_prim_rot = jnp.asarray(rot)[None]
        env_prim_semantic = jnp.asarray(sem)[None]
        n_box, n_cyl, n_sph, n_tri = 1, 1, 1, 1
        num_env_prims = 4

    # rays from just above the origin: +x hits the box face, +y the cylinder
    # side, -x the sphere, and a downward ray over the triangle its plane
    ro = jnp.asarray([[0.0, 0.0, 0.2]], jnp.float32)
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    d = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0],
                  [0.0, -1.0, -0.05]], np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d)

    asset_pos = jnp.zeros((1, 1, 3), jnp.float32)
    asset_quat = jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    t_ref, sem_ref, n_ref, face_ref = raycast.raycast_env_normals(
        _Sc.env_prim_kind[0], _Sc.env_prim_size[0], _Sc.env_prim_pos[0],
        _Sc.env_prim_rot[0], _Sc.env_prim_semantic[0], _Sc.env_prim_slot[0],
        asset_pos[0], asset_quat[0], ro[0], dirs, 50.0)

    prims = rp.pack_prims_world(_Sc, asset_pos, asset_quat)
    ones = jnp.ones((4,), jnp.float32)
    t_pal, _, n_pal, face_pal = rp.raycast_pallas(
        rp.pack_pose(ro, quat), prims, dirs, ones, 1, 1, 1, 50.0,
        n_tri=1, want_normals=True, interpret=True)

    n_pal, face_pal = np.asarray(n_pal)[0], np.asarray(face_pal)[0]
    np.testing.assert_array_equal(face_pal, np.asarray(face_ref))
    np.testing.assert_array_equal(face_pal, np.array([0, 1, 2, 3]))
    np.testing.assert_allclose(np.asarray(t_pal)[0], np.asarray(t_ref),
                               atol=2e-3)
    np.testing.assert_allclose(n_pal, np.asarray(n_ref), atol=5e-3)
    # sphere: ray travels at z=0.2, so the hit sits above the equator —
    # radial normal has z = 0.2/r and x = sqrt(1 - (0.2/r)^2)
    zr = 0.2 / 0.7
    analytic = np.array([[-1.0, 0.0, 0.0],    # box -x face
                         [0.0, -1.0, 0.0],    # cylinder side toward sensor
                         [np.sqrt(1 - zr * zr), 0.0, zr],   # sphere radial
                         [0.0, 0.0, 1.0]],    # triangle plane, toward ray
                        np.float32)
    np.testing.assert_allclose(n_pal, analytic, atol=1e-3)


def test_pallas_rgb_matches_oracle_shading(obstacle_env):
    """want_rgb mode (in-kernel Lambert shading, round-4 item: the RGB
    modality with no face/normal DMAs and no XLA-side shade) in lockstep
    with the oracle pipeline shade_rgb(raycast_batched_normals(...))."""
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import shade_rgb
    from aerial_gym_simulator_tpu.utils.math import quat_rotate

    env = obstacle_env
    params, state = env.params, env.state
    sc = params.scene
    H, W = 8, 128
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    R = dirs.shape[0]
    max_range = 4.0   # leaves both hits and misses (sky pixels)
    # non-trivial depth multiplier (range -> z-depth cos factors) so the
    # in-kernel fade is exercised on the true depth, not raw range
    mult = jnp.asarray(np.asarray(dirs)[:, 2], jnp.float32)

    rd_world = quat_rotate(state.quat[:, None, :], dirs[None, :, :])
    t_ref, sem_ref, n_ref, face_ref = raycast.raycast_batched_normals(
        sc, state.obstacle_pos, state.obstacle_quat, state.pos, rd_world,
        max_range)
    depth_ref = jnp.where(face_ref >= 0, t_ref * mult[None, :],
                          raycast.NO_HIT_RAY_VAL)
    rgb_ref = shade_rgb(depth_ref, n_ref, face_ref, sem_ref, max_range)

    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    depth_pal, seg_pal, rgb_pal = rp.raycast_pallas(
        rp.pack_pose(state.pos, state.quat), prims, dirs, mult,
        sc.n_box, sc.n_cyl, sc.n_sph, float(max_range), want_rgb=True,
        n_tri=sc.n_tri, interpret=True)

    depth_ref = np.asarray(depth_ref)
    rgb_ref = np.asarray(rgb_ref)
    depth_pal = np.asarray(depth_pal)
    seg_pal = np.asarray(seg_pal)
    rgb_pal = np.asarray(rgb_pal)
    face_ref = np.asarray(face_ref)

    hit = face_ref >= 0
    assert hit.any() and (~hit).any()
    np.testing.assert_allclose(depth_pal, depth_ref, atol=2e-3)
    # misses carry exact NO_HIT depth / seg / sky color
    assert (depth_pal[~hit] == raycast.NO_HIT_RAY_VAL).all()
    assert (seg_pal[~hit] == raycast.NO_HIT_SEGMENTATION_VAL).all()
    np.testing.assert_allclose(rgb_pal[~hit], rgb_ref[~hit], atol=1e-6)
    # shaded pixels agree where the same primitive won (razor ties aside)
    same = seg_pal == np.asarray(sem_ref)
    assert same.mean() > 0.995
    np.testing.assert_allclose(rgb_pal[hit & same], rgb_ref[hit & same],
                               atol=5e-3)
    assert rgb_pal.min() >= 0.0 and rgb_pal.max() <= 1.0 + 1e-6


def test_pallas_rgb_column_split_ordering_invariant(obstacle_env):
    """The TPU render_rgb wrapper feeds rays in column-half order (tighter
    view cones) and unsplits the images; the result must equal the
    row-major order bit-for-tolerance — including the reordered depth
    multiplier (the one input unique to rgb mode)."""
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        column_split_dirs, column_split_flat, column_unsplit_image)

    env = obstacle_env
    params, state = env.params, env.state
    sc = params.scene
    N = state.pos.shape[0]
    H, W = 8, 128
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    mult = jnp.asarray(np.asarray(dirs)[:, 2], jnp.float32)
    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    pose = rp.pack_pose(state.pos, state.quat)

    d_a, s_a, rgb_a = rp.raycast_pallas(pose, prims, dirs, mult, sc.n_box,
                                        sc.n_cyl, sc.n_sph, 4.0,
                                        want_rgb=True, n_tri=sc.n_tri,
                                        interpret=True)
    d_b, s_b, rgb_b = rp.raycast_pallas(
        pose, prims, column_split_dirs(dirs, H, W),
        column_split_flat(mult, H, W), sc.n_box, sc.n_cyl, sc.n_sph, 4.0,
        want_rgb=True, n_tri=sc.n_tri, interpret=True)
    d_b = column_unsplit_image(d_b, N, H, W)
    s_b = column_unsplit_image(s_b, N, H, W)
    rgb_b = column_unsplit_image(rgb_b, N, H, W)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_a), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_b), np.asarray(s_a))
    np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_a),
                               atol=1e-6)


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
