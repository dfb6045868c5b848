"""Rigid-body integration + controller behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
from aerial_gym_simulator_tpu.utils import math as agm


@pytest.fixture(scope="module")
def empty_env():
    return SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                  "no_control", num_envs=8, seed=0)


def still_state(env):
    """Zero-velocity, level state at origin."""
    st = env.state
    return st.replace(
        pos=jnp.zeros_like(st.pos),
        quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (st.pos.shape[0], 1)),
        linvel=jnp.zeros_like(st.linvel),
        angvel=jnp.zeros_like(st.angvel),
        motor_thrust=jnp.zeros_like(st.motor_thrust),
    )


def test_free_fall(empty_env):
    env = empty_env
    env.state = still_state(env)
    n = 50
    for _ in range(n):
        env.step(jnp.zeros((8, 4)))
    t = n * 0.01
    z = np.asarray(env.state.pos[:, 2])
    # semi-implicit Euler with per-step damping; loose tolerance vs -g t^2/2
    assert abs(z.mean() + 0.5 * 9.81 * t**2) < 0.05
    vz = np.asarray(env.state.linvel[:, 2])
    assert abs(vz.mean() + 9.81 * t) < 0.05


def test_hover_equilibrium(empty_env):
    env = empty_env
    hover = 0.25 * 9.81 / 4.0
    st = still_state(env)
    env.state = st.replace(motor_thrust=jnp.full_like(st.motor_thrust, hover))
    for _ in range(200):
        env.step(jnp.full((8, 4), hover))
    st = env.state
    assert np.abs(np.asarray(st.pos[:, 2])).max() < 0.05
    assert np.abs(np.asarray(st.linvel)).max() < 0.05
    np.testing.assert_allclose(np.linalg.norm(np.asarray(st.quat), axis=-1),
                               1.0, atol=1e-5)


def test_yaw_torque_spins_quad(empty_env):
    env = empty_env
    env.state = still_state(env)
    hover = 0.25 * 9.81 / 4.0
    # motors 0,2 spin +1, motors 1,3 spin -1; raising 0,2 yields net -z drag
    # torque via allocation row 5 = [-0.01, 0.01, -0.01, 0.01]
    act = jnp.asarray(np.tile([hover * 1.4, hover * 0.6] * 2, (8, 1)), jnp.float32)
    for _ in range(50):
        env.step(act)
    wz = np.asarray(env.state.angvel[:, 2])
    assert np.all(wz < -0.05)  # negative yaw rate expected


def test_attitude_controller_levels_robot():
    env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                 "lee_attitude_control", num_envs=8, seed=1)
    st = env.state
    tilted = st.replace(
        pos=jnp.zeros_like(st.pos),
        quat=jnp.tile(
            jnp.asarray([[0.2, -0.15, 0.0, 0.0]], jnp.float32) /
            np.linalg.norm([0.2, -0.15, 0.0, 0.9687]), (8, 1)),
        linvel=jnp.zeros_like(st.linvel),
        angvel=jnp.zeros_like(st.angvel),
    )
    # normalize quat properly
    q = np.array([0.2, -0.15, 0.0, 0.9687], np.float32)
    q /= np.linalg.norm(q)
    tilted = tilted.replace(quat=jnp.tile(jnp.asarray(q), (8, 1)))
    env.state = tilted
    for _ in range(300):
        env.step(jnp.zeros((8, 4)))  # commanded roll=pitch=0
    euler = np.asarray(agm.ssa(agm.get_euler_xyz_tensor(env.state.quat)))
    assert np.abs(euler[:, :2]).max() < 0.03  # leveled within ~2 deg


def test_velocity_controller_tracks(empty_env_=None):
    env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                 "lee_velocity_control", num_envs=8, seed=2)
    st = env.state
    env.state = st.replace(pos=jnp.zeros_like(st.pos),
                           quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (8, 1)),
                           linvel=jnp.zeros_like(st.linvel),
                           angvel=jnp.zeros_like(st.angvel))
    cmd = jnp.tile(jnp.asarray([[0.5, 0.0, 0.0, 0.0]], jnp.float32), (8, 1))
    for _ in range(300):
        env.step(cmd)
    v = np.asarray(env.state.linvel)
    assert abs(v[:, 0].mean() - 0.5) < 0.1
    assert abs(v[:, 1].mean()) < 0.05
    assert abs(v[:, 2].mean()) < 0.05


def test_determinism_same_seed():
    def run(seed):
        env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                     "lee_attitude_control", num_envs=4, seed=seed)
        for _ in range(10):
            env.step(jnp.zeros((4, 4)))
        return np.asarray(env.state.pos)

    a, b = run(42), run(42)
    np.testing.assert_array_equal(a, b)
    c = run(43)
    assert not np.allclose(a, c)


def test_reset_positions_within_bounds(empty_env):
    env = empty_env
    env.reset()
    pos = np.asarray(env.state.pos)
    lo = np.asarray(env.state.bounds_lo)
    hi = np.asarray(env.state.bounds_hi)
    assert np.all(pos >= lo - 1e-5) and np.all(pos <= hi + 1e-5)


def test_randomized_substeps_traced_path():
    """substep_std > 0 takes the traced-n fori_loop branch of env_step
    (reference env_manager.py:417-425 randomized control-rate decimation):
    host-sampled counts vary, the jitted step runs with a traced scalar,
    and the sim advances with finite state."""
    env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                 "lee_attitude_control", num_envs=4, seed=0)
    env.reset()
    env.params = env.params.replace(
        env=env.params.env.replace(substep_mean=5, substep_std=2.0))
    env._params_key = id(env.params)  # static jit key follows the params

    counts = {env._sample_substeps() for _ in range(50)}
    assert len(counts) > 1, "substep counts should vary"
    assert all(c >= 0 for c in counts)

    p0 = np.asarray(env.state.pos).copy()
    actions = jnp.zeros((4, 4), jnp.float32)
    for _ in range(5):
        env.step(actions)
    p1 = np.asarray(env.state.pos)
    assert np.isfinite(p1).all()
    assert not np.array_equal(p0, p1), "randomized substeps must advance sim"
