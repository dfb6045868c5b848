"""Differentiable rendering (ops/raycast_diff.py): Pallas forward equals
the oracle, the custom VJP matches finite differences, and inverse
rendering (pose from a target depth image) converges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.ops import raycast
from aerial_gym_simulator_tpu.ops.raycast_diff import raycast_depth_diff
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


@pytest.fixture(scope="module")
def env():
    e = SimBuilder().build_env("base_sim", "env_with_obstacles",
                               "base_quadrotor", "lee_velocity_control",
                               num_envs=2, seed=7)
    e.reset()
    return e


def _ray_table(H=8, W=128):
    ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, H),
                         np.linspace(-0.6, 0.6, W), indexing="ij")
    dirs = np.stack([xs, ys, np.ones_like(xs)], axis=-1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return jnp.asarray(dirs.reshape(-1, 3), jnp.float32)


def test_diff_forward_matches_oracle_and_kernel(env):
    sc = env.params.scene
    st = env.state
    dirs = _ray_table()

    t_int = raycast_depth_diff(sc, st.obstacle_pos, st.obstacle_quat,
                               st.pos, st.quat, dirs, 10.0, "interpret")
    t_orc = raycast_depth_diff(sc, st.obstacle_pos, st.obstacle_quat,
                               st.pos, st.quat, dirs, 10.0, "oracle")
    np.testing.assert_allclose(np.asarray(t_int), np.asarray(t_orc),
                               atol=1e-4)
    assert (np.asarray(t_orc) < raycast.NO_HIT_RAY_VAL).any(), \
        "scene should produce some hits"


def test_diff_gradients_match_finite_differences(env):
    sc = env.params.scene
    st = env.state
    dirs = _ray_table()
    w = jnp.sin(jnp.arange(dirs.shape[0]) * 0.37)  # non-degenerate weights

    def f(op, o):
        t = raycast_depth_diff(sc, op, st.obstacle_quat, o, st.quat, dirs,
                               10.0, "interpret")
        # exclude NO_HIT sentinels: their step to 1000.0 is the one true
        # discontinuity and FD straddles it
        hit = t < raycast.NO_HIT_RAY_VAL
        return jnp.sum(jnp.where(hit, t, 0.0) * w)

    g_op, g_o = jax.grad(f, argnums=(0, 1))(st.obstacle_pos, st.pos)
    assert np.isfinite(np.asarray(g_op)).all()
    assert np.isfinite(np.asarray(g_o)).all()
    assert np.abs(np.asarray(g_op)).max() > 0.0, "no gradient signal"

    # FD spot-check on the largest-gradient obstacle coordinate
    flat = np.abs(np.asarray(g_op)).reshape(-1)
    idx = np.unravel_index(int(flat.argmax()), g_op.shape)
    eps = 1e-3
    op = np.asarray(st.obstacle_pos).copy()
    opp, opm = op.copy(), op.copy()
    opp[idx] += eps
    opm[idx] -= eps
    fd = (float(f(jnp.asarray(opp), st.pos))
          - float(f(jnp.asarray(opm), st.pos))) / (2 * eps)
    np.testing.assert_allclose(float(np.asarray(g_op)[idx]), fd, rtol=0.05,
                               atol=1e-2)


def test_inverse_rendering_recovers_pose(env):
    """Gradient-descend obstacle positions to match a target depth image
    (pose-from-depth — the reference's renderer exposes no adjoint)."""
    import optax

    sc = env.params.scene
    st = env.state
    dirs = _ray_table()

    target = raycast_depth_diff(sc, st.obstacle_pos, st.obstacle_quat,
                                st.pos, st.quat, dirs, 10.0, "oracle")
    hit = target < raycast.NO_HIT_RAY_VAL

    key = jax.random.PRNGKey(0)
    op0 = st.obstacle_pos + 0.15 * jax.random.normal(
        key, st.obstacle_pos.shape)

    def loss_fn(op):
        t = raycast_depth_diff(sc, op, st.obstacle_quat, st.pos, st.quat,
                               dirs, 10.0, "oracle")
        return jnp.mean(jnp.where(hit, (t - target) ** 2, 0.0))

    opt = optax.adam(0.02)
    opt_state = opt.init(op0)

    @jax.jit
    def step(op, opt_state):
        l, g = jax.value_and_grad(loss_fn)(op)
        u, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(op, u), opt_state, l

    op = op0
    l0 = float(loss_fn(op0))
    for _ in range(150):
        op, opt_state, l = step(op, opt_state)
    assert float(l) < 0.05 * l0, f"inverse rendering stalled: {l0} -> {l}"
