"""Ray-cast core vs analytic intersections (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.ops import raycast as rc
from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
    camera_ray_dirs,
    lidar_ray_dirs,
)


def single_prim_env(kind, size, asset_pos, ro, rd):
    """Cast rays against one primitive at asset_pos (identity rotations)."""
    P = 1
    t, sem = rc.raycast_env(
        prim_kind=jnp.array([kind], jnp.int32),
        prim_size=jnp.asarray([size], jnp.float32),
        prim_pos=jnp.zeros((P, 3), jnp.float32),
        prim_rot=jnp.tile(jnp.eye(3, dtype=jnp.float32), (P, 1, 1)),
        prim_sem=jnp.array([7], jnp.int32),
        prim_slot=jnp.zeros((P,), jnp.int32),
        asset_pos=jnp.asarray([asset_pos], jnp.float32),
        asset_quat=jnp.asarray([[0, 0, 0, 1.0]], jnp.float32),
        ro=jnp.asarray(ro, jnp.float32),
        rd=jnp.asarray(rd, jnp.float32),
        max_range=100.0,
    )
    return np.asarray(t), np.asarray(sem)


def test_ray_sphere_analytic():
    # unit sphere at x=5, ray along +x from origin: t = 5 - 1 = 4
    t, sem = single_prim_env(2, [1.0, 0, 0], [5.0, 0, 0], [0, 0, 0],
                             [[1.0, 0, 0]])
    np.testing.assert_allclose(t, [4.0], atol=1e-5)
    assert sem[0] == 7


def test_ray_box_analytic():
    # 2x2x2 box at x=10: entry at x=9 -> t=9
    t, _ = single_prim_env(0, [2.0, 2.0, 2.0], [10.0, 0, 0], [0, 0, 0],
                           [[1.0, 0, 0]])
    np.testing.assert_allclose(t, [9.0], atol=1e-5)


def test_ray_box_miss():
    t, sem = single_prim_env(0, [2.0, 2.0, 2.0], [10.0, 0, 0], [0, 0, 0],
                             [[0.0, 1.0, 0]])
    np.testing.assert_allclose(t, [rc.NO_HIT_RAY_VAL])
    assert sem[0] == rc.NO_HIT_SEGMENTATION_VAL


def test_ray_cylinder_side_and_cap():
    # cylinder r=1, len=4, at origin; ray from (5,0,0) toward -x hits side at x=1
    t, _ = single_prim_env(1, [1.0, 4.0, 0], [0, 0, 0], [5.0, 0, 0],
                           [[-1.0, 0, 0]])
    np.testing.assert_allclose(t, [4.0], atol=1e-5)
    # ray from (0,0,5) downward hits top cap at z=2 -> t=3
    t, _ = single_prim_env(1, [1.0, 4.0, 0], [0, 0, 0], [0, 0, 5.0],
                           [[0, 0, -1.0]])
    np.testing.assert_allclose(t, [3.0], atol=1e-5)


def test_ray_from_inside_box():
    # origin inside the box: exit distance
    t, _ = single_prim_env(0, [4.0, 4.0, 4.0], [0, 0, 0], [0, 0, 0],
                           [[1.0, 0, 0]])
    np.testing.assert_allclose(t, [2.0], atol=1e-5)


def test_nearest_of_two_prims():
    t, sem = rc.raycast_env(
        prim_kind=jnp.array([2, 2], jnp.int32),
        prim_size=jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32),
        prim_pos=jnp.zeros((2, 3), jnp.float32),
        prim_rot=jnp.tile(jnp.eye(3, dtype=jnp.float32), (2, 1, 1)),
        prim_sem=jnp.array([1, 2], jnp.int32),
        prim_slot=jnp.array([0, 1], jnp.int32),
        asset_pos=jnp.asarray([[10.0, 0, 0], [5.0, 0, 0]], jnp.float32),
        asset_quat=jnp.tile(jnp.asarray([[0, 0, 0, 1.0]], jnp.float32), (2, 1)),
        ro=jnp.zeros((3,), jnp.float32),
        rd=jnp.asarray([[1.0, 0, 0]], jnp.float32),
        max_range=100.0,
    )
    np.testing.assert_allclose(np.asarray(t), [4.0], atol=1e-5)
    assert int(sem[0]) == 2  # nearer sphere's id


def test_rotated_asset():
    # 4x1x1 box rotated 90deg about z at x=5: its long axis now spans y;
    # a ray along +x hits the (now) 1-thick face at 4.5
    q = jnp.asarray([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], jnp.float32)
    t, _ = rc.raycast_env(
        prim_kind=jnp.array([0], jnp.int32),
        prim_size=jnp.asarray([[4.0, 1.0, 1.0]], jnp.float32),
        prim_pos=jnp.zeros((1, 3), jnp.float32),
        prim_rot=jnp.tile(jnp.eye(3, dtype=jnp.float32), (1, 1, 1)),
        prim_sem=jnp.array([1], jnp.int32),
        prim_slot=jnp.zeros((1,), jnp.int32),
        asset_pos=jnp.asarray([[5.0, 0, 0]], jnp.float32),
        asset_quat=q[None],
        ro=jnp.zeros((3,), jnp.float32),
        rd=jnp.asarray([[1.0, 0, 0]], jnp.float32),
        max_range=100.0,
    )
    np.testing.assert_allclose(np.asarray(t), [4.5], atol=1e-4)


def test_camera_ray_table_geometry():
    dirs, mult = camera_ray_dirs(9, 16, 90.0)
    d = np.asarray(dirs)
    # center pixel looks along +z (optical axis) within half a pixel
    c = d[4, 8]
    assert np.degrees(np.arccos(np.clip(c[2], -1, 1))) < 5.0
    # corner rays tilt at most HFOV/2 horizontally
    assert np.all(np.abs(np.arctan2(d[..., 0], d[..., 2])) <= np.radians(46))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # depth multiplier equals dir . principal
    np.testing.assert_allclose(np.asarray(mult), d[..., 2], atol=1e-4)


def test_lidar_ray_table_geometry():
    dirs, _ = lidar_ray_dirs(3, 8, -180, 180, -30, 30)
    d = np.asarray(dirs)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # first scan line at +30 deg elevation
    np.testing.assert_allclose(d[0, :, 2], np.sin(np.radians(30)), atol=1e-5)
    # first azimuth at +180deg: direction -x
    np.testing.assert_allclose(d[1, 0, 0], -np.cos(0.0), atol=1e-5)


def test_full_camera_render_wall():
    """End-to-end: robot in env_with_obstacles facing the front wall."""
    import jax
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import render_camera

    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control", num_envs=2, seed=0)
    st = env.state
    # place robot at a known spot looking +x; front wall is at bounds x_max
    st = st.replace(pos=jnp.asarray([[0.0, 0.0, 0.0]] * 2, jnp.float32),
                    quat=jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (2, 1)),
                    cam_mount_pos=jnp.zeros((2, 3), jnp.float32),
                    cam_mount_quat=jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (2, 1)))
    pixels, seg = render_camera(env.params, st)
    pixels = np.asarray(pixels)
    assert pixels.shape == (2, 135, 240)
    # normalized range in [-1, 1]
    assert pixels.max() <= 1.0 + 1e-5
    # something visible (walls guaranteed within 10m ahead from x=0:
    # upper bound x in [9, 10])
    assert pixels.min() > -1.0 - 1e-5
    center = pixels[:, 67, 120]
    assert np.all(center > 0.0)  # wall ahead within range
    assert seg is not None and seg.shape == (2, 135, 240)


def test_rgb_camera_render():
    """Onboard RGB modality (round 2): the capture the reference only had
    via Isaac Gym's native camera (isaacgym_camera_sensor.py:136-137) is a
    shading of the unified ray-cast render — sky where nothing is hit,
    palette-albedo Lambert shading where something is, jit-compatible."""
    import jax
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        SEG_ALBEDO, _SKY_RGB, render_normal_faceid_camera, render_rgb_camera)

    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control", num_envs=2, seed=0)
    st = env.state
    st = st.replace(pos=jnp.asarray([[0.0, 0.0, 0.0]] * 2, jnp.float32),
                    quat=jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (2, 1)),
                    cam_mount_pos=jnp.zeros((2, 3), jnp.float32),
                    cam_mount_quat=jnp.tile(jnp.asarray([0, 0, 0, 1.0],
                                                        jnp.float32), (2, 1)))
    rgb, depth, seg = jax.jit(render_rgb_camera)(env.params, st)
    rgb = np.asarray(rgb)
    depth = np.asarray(depth)
    seg = np.asarray(seg)
    assert rgb.shape == (2, 135, 240, 3)
    assert np.isfinite(rgb).all() and rgb.min() >= 0.0 and rgb.max() <= 1.0

    # hit/miss mask from the SAME jitted program's own depth output (inside
    # one program depth==NO_HIT <=> face<0 <=> sky by construction); a mask
    # taken from an independently compiled capture can flip on a grazing
    # silhouette ray when XLA reassociates fp differently (ADVICE r2)
    from aerial_gym_simulator_tpu.ops.raycast import NO_HIT_RAY_VAL
    miss = depth >= NO_HIT_RAY_VAL
    hit = ~miss
    assert hit.any()  # front wall guaranteed in view
    # sky exactly where nothing was hit
    if miss.any():
        assert np.allclose(rgb[miss], _SKY_RGB, atol=1e-6)
    # hit pixels carry their segmentation id's albedo hue: rgb is
    # albedo * scalar, so channel ratios match the palette row
    ij = tuple(a[0] for a in np.nonzero(hit))
    px = rgb[ij]
    alb = SEG_ALBEDO[abs(int(seg[ij])) % len(SEG_ALBEDO)]
    scale = px / alb
    assert np.allclose(scale, scale.mean(), atol=1e-5)
    assert 0.0 < scale.mean() <= 1.0 + 1e-6
    # depth/seg passthrough vs the separately compiled normal/faceid capture:
    # tolerate a sub-0.1% silhouette-pixel disagreement between programs
    depth_ref, _, face, seg_ref = jax.jit(render_normal_faceid_camera)(
        env.params, st)
    depth_ref = np.asarray(depth_ref)
    seg_ref = np.asarray(seg_ref)
    mismatch = ~np.isclose(depth, depth_ref, rtol=1e-5, atol=1e-4)
    assert mismatch.mean() < 1e-3
    assert (seg != seg_ref).mean() < 1e-3


def test_env_manager_obs_dict_render_keys():
    """EnvManager.get_obs() exposes the reference global_tensor_dict render
    keys: depth_range_pixels/segmentation_pixels after render(), and
    rgb_pixels after render('rgb') (reference robot_manager.py:160)."""
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control", num_envs=2, seed=0)
    env.reset()
    obs = env.get_obs()
    assert "depth_range_pixels" not in obs  # nothing captured yet
    env.render()
    obs = env.get_obs()
    assert obs["depth_range_pixels"].shape == (2, 135, 240)
    assert "rgb_pixels" not in obs
    env.render("rgb")
    obs = env.get_obs()
    rgb = np.asarray(obs["rgb_pixels"])
    assert rgb.shape == (2, 135, 240, 3)
    assert np.isfinite(rgb).all() and rgb.min() >= 0.0 and rgb.max() <= 1.0
    # parity scalars stay present
    assert obs["num_envs"] == 2 and "env_bounds_min" in obs


def test_column_split_roundtrip_through_renderer():
    """The TPU render paths reorder rays into column-half blocks for
    tighter per-tile view cones (column_split_dirs) and invert the
    ordering on every output image (column_unsplit_image). The invariant
    that matters is unsplit(render(split(dirs))) == render(dirs) — the
    compiled path only activates at R >= 16384 on chip, so this guards
    the pairing at test scale through the oracle renderer."""
    import jax
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        column_split_dirs, column_unsplit_image)

    H, W, N = 6, 8, 3
    R = H * W
    rng = np.random.RandomState(0)

    # pure round-trip incl. trailing channel dims
    for lead in [(), (3,)]:
        img = jnp.asarray(rng.randn(N, R, *lead).astype(np.float32))
        img_split = jnp.transpose(
            img.reshape(N, H, 2, W // 2, *lead),
            (0, 2, 1, 3) + tuple(4 + k for k in range(len(lead)))
        ).reshape(N, R, *lead)
        back = column_unsplit_image(img_split, N, H, W)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

    # through a renderer: one sphere ahead, random-ish dirs grid
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    d = np.stack([np.ones_like(xs), xs, ys], -1).reshape(R, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dirs = jnp.asarray(d, jnp.float32)
    ro = np.zeros((N, 3), np.float32)
    ro[:, 0] = -3.0

    def oracle(rd_order):
        t, _ = single_prim_env(2, [1.0, 0, 0], [0.0, 0.0, 0.0],
                               ro[0], np.asarray(rd_order))
        return jnp.broadcast_to(jnp.asarray(t)[None], (N, R))

    t_plain = oracle(dirs)
    t_split = oracle(column_split_dirs(dirs, H, W))
    t_back = column_unsplit_image(t_split, N, H, W)
    np.testing.assert_allclose(np.asarray(t_back), np.asarray(t_plain),
                               rtol=1e-6)
    # sanity: the split image really is a different ordering
    assert not np.array_equal(np.asarray(t_split), np.asarray(t_plain))


def test_multi_sensor_normal_faceid_and_rgb_wrappers():
    """num_sensors>1 stacking on the normal/face-id and RGB modalities:
    each (N, S, ...) output slice equals the single-mount render at that
    mount pose (the wrappers loop the S=1 core, so this is pure plumbing
    — but it guards the axis conventions every consumer relies on)."""
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        render_normal_faceid, render_rgb)

    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control", num_envs=2, seed=0)
    sp = env.params.camera
    # two distinct hand-built mounts: nominal and 10 cm up
    m0 = jnp.zeros((2, 3), jnp.float32)
    m1 = m0.at[:, 2].set(0.1)
    mq = jnp.tile(jnp.asarray([0, 0, 0, 1.0], jnp.float32), (2, 1))
    mpos = jnp.stack([m0, m1], axis=1)                  # (2, 2, 3)
    mquat = jnp.stack([mq, mq], axis=1)                 # (2, 2, 4)

    d, n, f, s = render_normal_faceid(env.params, env.state, sp, mpos, mquat)
    assert d.shape == (2, 2, sp.height, sp.width)
    assert n.shape == (2, 2, sp.height, sp.width, 3)
    d0, n0, f0, s0 = render_normal_faceid(env.params, env.state, sp, m1, mq)
    np.testing.assert_array_equal(np.asarray(d[:, 1]), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(f[:, 1]), np.asarray(f0))

    rgb, dep, seg = render_rgb(env.params, env.state, sp, mpos, mquat)
    assert rgb.shape == (2, 2, sp.height, sp.width, 3)
    rgb0, *_ = render_rgb(env.params, env.state, sp, m0, mq)
    np.testing.assert_array_equal(np.asarray(rgb[:, 0]), np.asarray(rgb0))
