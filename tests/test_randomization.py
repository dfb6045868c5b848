"""Distributional parity of the domain-randomization machinery.

The reference randomizes at ~10 distinct points (SURVEY §5.3: wrench
disturbances base_multirotor.py:213-234, motor constants
motor_model.py:140-154, controller gains base_lee_controller.py:101-118,
sensor mount/noise/dropout warp_sensor.py:153-171/229-247, IMU bias/noise
imu_sensor.py:74-83, obstacle density env_manager.py:287-295, pose ratios
asset_manager.py:52-72). These tests check each of this framework's
seeded, per-env-keyed equivalents *statistically*: rates match the
configured probabilities, samples stay inside the configured ranges and
actually spread across them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.registry.registries import robot_registry
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def _spread_in(x, lo, hi, span_frac=0.5):
    """Samples lie in [lo, hi] and cover at least span_frac of it."""
    x = np.asarray(x, np.float64)
    lo, hi = np.broadcast_to(lo, x.shape[-1:]), np.broadcast_to(hi, x.shape[-1:])
    assert (x >= lo - 1e-5).all() and (x <= hi + 1e-5).all()
    width = np.maximum(hi - lo, 1e-12)
    covered = (x.max(axis=0) - x.min(axis=0)) / width
    assert (covered[width.squeeze() > 1e-9] > span_frac).all(), covered


def test_disturbance_bernoulli_rate_and_bounds():
    """Random wrench disturbance: occurrence ~ Bernoulli(prob), magnitudes
    uniform within the configured box (base_multirotor.py:213-234)."""
    from aerial_gym_simulator_tpu.config.robot_config.catalog import base_quadrotor

    def robot():
        cfg = base_quadrotor()
        cfg.name = "rand_test_quad"
        cfg.disturbance.enable_disturbance = True
        cfg.disturbance.prob_apply_disturbance = 0.10
        cfg.disturbance.max_force_and_torque_disturbance = [
            0.75, 0.75, 0.75, 0.004, 0.004, 0.004]
        return cfg

    try:
        robot_registry.register("rand_test_quad", robot)
    except Exception:
        pass
    env = SimBuilder().build_env("base_sim", "empty_env", "rand_test_quad",
                                 "no_control", num_envs=256, seed=0)
    env.reset()
    # zero thrust + zero velocity => applied_force_b is the disturbance only
    env.state = env.state.replace(
        motor_thrust=jnp.zeros_like(env.state.motor_thrust),
        linvel=jnp.zeros_like(env.state.linvel),
        angvel=jnp.zeros_like(env.state.angvel))
    a = jnp.zeros((256, env.params.motor.num_motors))
    hits, mags = [], []
    for _ in range(60):
        env.step(a)
        f = np.asarray(env.state.applied_force_b)
        occurred = np.abs(f).max(axis=-1) > 1e-7
        hits.append(occurred)
        mags.append(f[occurred])
        # keep the no-feedback regime
        env.state = env.state.replace(
            motor_thrust=jnp.zeros_like(env.state.motor_thrust),
            linvel=jnp.zeros_like(env.state.linvel),
            angvel=jnp.zeros_like(env.state.angvel))
    rate = np.mean(np.concatenate(hits))
    assert 0.07 < rate < 0.13, rate               # 15k trials at p=0.1
    mags = np.concatenate(mags)
    assert (np.abs(mags) <= 0.75 + 1e-5).all()
    assert np.abs(mags).max() > 0.5               # actually spans the box


@pytest.fixture(scope="module")
def lmf2_env():
    env = SimBuilder().build_env("base_sim", "empty_env", "lmf2",
                                 "lmf2_velocity_control", num_envs=512, seed=1)
    env.reset()
    return env


def test_motor_constant_randomization(lmf2_env):
    """Per-env motor time constants resampled at reset within the config
    range (motor_model.py:140-154; lmf2: tau_inc 0.05..0.08)."""
    st = lmf2_env.state
    _spread_in(np.asarray(st.motor_tau_inc).reshape(-1, 1), [0.05], [0.08])
    # decreasing constants are configured degenerate (0.005..0.005)
    np.testing.assert_allclose(np.asarray(st.motor_tau_dec), 0.005, atol=1e-6)


def test_controller_gain_randomization(lmf2_env):
    """Per-env Lee-controller gains within [K_min, K_max] when enabled
    (base_lee_controller.py:101-118); degenerate ranges stay fixed."""
    cp = lmf2_env.params.controller
    st = lmf2_env.state
    for K, lo, hi in [(st.K_pos, cp.K_pos_min, cp.K_pos_max),
                      (st.K_vel, cp.K_vel_min, cp.K_vel_max),
                      (st.K_rot, cp.K_rot_min, cp.K_rot_max),
                      (st.K_angvel, cp.K_angvel_min, cp.K_angvel_max)]:
        K, lo, hi = np.asarray(K), np.asarray(lo), np.asarray(hi)
        # reference configs may order a component max < min; uniform
        # sampling (like torch_rand_float_tensor) spans the interval
        # either way
        lo, hi = np.minimum(lo, hi), np.maximum(lo, hi)
        assert (K >= lo - 1e-5).all() and (K <= hi + 1e-5).all()
        if cp.randomize_params:
            wide = (hi - lo) > 1e-6
            if wide.any():
                assert K[:, wide].std(axis=0).min() > 0.0


def test_sensor_mount_randomization():
    """Lidar mount pose resampled within the translation box at reset
    (warp_sensor.py:92-127 randomize_placement)."""
    env = SimBuilder().build_env("base_sim", "empty_env",
                                 "base_quadrotor_with_lidar",
                                 "lee_velocity_control", num_envs=256, seed=2)
    env.reset()
    sp = env.params.lidar
    assert sp.randomize_placement
    _spread_in(np.asarray(env.state.lidar_mount_pos),
               np.asarray(sp.min_translation), np.asarray(sp.max_translation))


def test_pixel_noise_std_and_dropout_rate():
    """Depth noise std = a x^2 + b x + c and dropout ~ Bernoulli(p)
    (warp_sensor.py:229-247)."""
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import apply_noise

    class SP:  # minimal params stub with the fields apply_noise touches
        std_a, std_b, std_c = 0.0, 0.0, 0.04
        mean_offset = 0.0
        pixel_dropout_prob = 0.02
        near_out_value = -1.0

    pixels = jnp.full((200, 200), 3.0)
    out = np.asarray(apply_noise(SP, pixels, jax.random.PRNGKey(0)))
    dropped = out == SP.near_out_value
    rate = dropped.mean()
    assert 0.015 < rate < 0.025, rate             # 40k pixels at p=0.02
    kept = out[~dropped]
    assert abs(kept.mean() - 3.0) < 0.002
    assert abs(kept.std() - 0.04) < 0.002


def test_imu_bias_random_walk_scaling():
    """Bias variance grows linearly in time: std after T steps
    = bias_std * sqrt(T * dt) (imu_sensor.py:79-83)."""
    env = SimBuilder().build_env("base_sim", "empty_env",
                                 "base_quadrotor_with_imu",
                                 "lee_attitude_control", num_envs=2048, seed=3)
    env.reset()
    from aerial_gym_simulator_tpu.sensors.imu import imu_measurement
    ip = env.params.imu
    st = env.state.replace(imu_accel_bias=jnp.zeros_like(env.state.imu_accel_bias))
    T = 100
    key = jax.random.PRNGKey(7)
    for i in range(T):
        key, k = jax.random.split(key)
        _a, _g, ab, gb = imu_measurement(env.params, st, k)
        st = st.replace(imu_accel_bias=ab, imu_gyro_bias=gb)
    expected = (np.asarray(ip.accel_bias_std).mean()
                * np.sqrt(T * float(np.asarray(env.params.dt))))
    measured = np.asarray(st.imu_accel_bias).std()
    assert 0.85 * expected < measured < 1.15 * expected, (measured, expected)


def test_obstacle_density_bernoulli_and_pose_ranges():
    """Obstacle reset: poses interpolated from U[min,max] ratios into env
    bounds; ~15% of envs get half density; culled slots parked at -1000
    (asset_manager.py:52-72, env_manager.py:284-295)."""
    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor", "lee_velocity_control",
                                 num_envs=1024, seed=4)
    env.reset()
    st, sc = env.state, env.params.scene
    pos = np.asarray(st.obstacle_pos)                      # (N, A, 3)
    parked = pos[..., 0] < -900.0
    active = ~parked
    # active obstacles inside the env bounds
    lo = np.asarray(st.bounds_lo)[:, None, :]
    hi = np.asarray(st.bounds_hi)[:, None, :]
    inside = (pos >= lo - 1e-4) & (pos <= hi + 1e-4)
    assert inside.all(axis=-1)[active].all()
    # half-density episodes: active count per env is either the curriculum
    # count or ~half of it; the halved fraction ~ Bernoulli(0.15)
    counts = active.sum(axis=1)
    full = np.max(counts)
    halved = counts <= np.floor(full / 2.0) + np.sum(np.asarray(sc.keep_in_env))
    rate = halved.mean()
    assert 0.10 < rate < 0.20, rate
