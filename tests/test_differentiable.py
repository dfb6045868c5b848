"""Differentiable simulation — reverse-mode AD through whole rollouts.

A TPU-first capability beyond the reference (its PhysX core is a closed
binary): env_step (sim/dynamics.py) is a pure JAX function, so physical
parameters are identifiable by gradient descent on trajectory error.
Guards the safe_sqrt/safe_norm gradient plumbing (utils/math.py): plain
sqrt/norm backward is inf/NaN at 0, which silently poisons rollout grads.
"""

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

# the test exercises the EXAMPLE's rollout builder so the documented
# recipe and the regression test cannot silently diverge
_spec = importlib.util.spec_from_file_location(
    "diff_sysid_example",
    pathlib.Path(__file__).resolve().parent.parent
    / "examples" / "differentiable_sysid_example.py")
sysid = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sysid)


@pytest.fixture(scope="module")
def env():
    e = SimBuilder().build_env(
        sim_name="base_sim", env_name="empty_env",
        robot_name="base_quadrotor",
        controller_name="lee_velocity_control", num_envs=2, seed=3)
    e.reset()
    return e


def _actions(steps):
    t = np.arange(steps)[:, None, None] * 0.01
    phase = np.arange(2)[None, :, None] * 0.9  # distinct per-env excitation
    cmd = np.concatenate([np.sin(6 * t + phase), np.sin(9 * t + 1.3 + phase),
                          np.sin(4 * t + 2.1 + phase),
                          0.3 * np.sin(3 * t + phase)], axis=2)
    return jnp.asarray(cmd, jnp.float32)


def _rollout_loss(env, actions):
    rollout = sysid.make_rollout(env.params, env.state, actions)

    def loss(theta):
        traj = rollout(theta)
        return jnp.sum(traj * jnp.sin(jnp.arange(traj.size).reshape(
            traj.shape) * 0.1))  # non-degenerate functional of the rollout

    return loss


def test_rollout_gradients_finite_and_match_fd(env):
    """Gradients through a 12-step rollout are finite and agree with
    central finite differences (the safe_sqrt/safe_norm regression test:
    before those, grads were NaN from step 2 on)."""
    loss = _rollout_loss(env, _actions(12))
    theta = {"tau": jnp.asarray(0.08),
             "drag": jnp.asarray([0.15, 0.12, 0.25])}
    g = jax.grad(loss)(theta)
    for k, v in g.items():
        assert bool(jnp.isfinite(v).all()), f"non-finite grad for {k}"

    # finite-difference check (f64-free: tolerances sized for f32)
    eps = 1e-3
    fd_tau = (loss({**theta, "tau": theta["tau"] + eps})
              - loss({**theta, "tau": theta["tau"] - eps})) / (2 * eps)
    np.testing.assert_allclose(float(g["tau"]), float(fd_tau),
                               rtol=0.05, atol=1e-3)
    for i in range(3):
        d = theta["drag"].at[i].add(eps)
        d2 = theta["drag"].at[i].add(-eps)
        fd = (loss({**theta, "drag": d})
              - loss({**theta, "drag": d2})) / (2 * eps)
        np.testing.assert_allclose(float(g["drag"][i]), float(fd),
                                   rtol=0.05, atol=1e-3)


def test_gradients_finite_through_obstacle_penetration():
    """Gradients stay finite through a crash in an obstacle env.

    Regression for the contact-gradient NaN hole (VERDICT r1): _sd_box used
    a bare jnp.linalg.norm whose backward is NaN exactly when the robot is
    INSIDE a box obstacle (max(q,0) == 0 vector) — i.e. precisely on the
    penetrating trajectories BPTT/sys-id through obstacle envs cares about.
    The rollout below forcibly penetrates an obstacle (crash registered) and
    asserts d(loss)/d(actions) and d(loss)/d(initial pos) are finite.
    """
    from aerial_gym_simulator_tpu.sim import dynamics

    e = SimBuilder().build_env(
        sim_name="base_sim", env_name="env_with_obstacles",
        robot_name="base_quadrotor",
        controller_name="lee_velocity_control", num_envs=2, seed=5)
    e.reset()
    params, state0 = e.params, e.state
    # teleport env 0's robot to the center of its first obstacle: inside a
    # box primitive the pre-fix backward pass was NaN
    obs0 = state0.obstacle_pos[0, 0]
    state0 = state0.replace(pos=state0.pos.at[0].set(obs0))

    steps = 6
    actions = jnp.zeros((steps, 2, 4), jnp.float32)

    def rollout_loss(acts, pos0):
        st = state0.replace(pos=pos0)

        def body(st, a):
            st = dynamics.env_step(params, st, a)
            return st, (st.pos, st.crashes)

        st, (traj, crashes) = jax.lax.scan(body, st, acts)
        # loss touches both the trajectory and the contact-driven crash
        # signal so the SDF gradient path is actually exercised
        return jnp.sum(traj**2) * (1.0 + 0.1 * jnp.sum(crashes)), crashes

    (loss, crashes), grads = jax.value_and_grad(
        rollout_loss, argnums=(0, 1), has_aux=True)(actions, state0.pos)
    assert float(crashes[:, 0].max()) > 0, "robot inside obstacle must crash"
    for g in grads:
        assert bool(jnp.isfinite(g).all()), "NaN/inf rollout grads through crash"
    assert bool(jnp.isfinite(loss))


def test_gradient_sysid_recovers_parameters(env):
    """Adam on trajectory MSE recovers motor tau + drag from a wrong guess
    (the examples/differentiable_sysid_example.py recipe, shrunk)."""
    import optax

    actions = _actions(40)
    rollout = sysid.make_rollout(env.params, env.state, actions)

    true_theta = {"tau": jnp.asarray(0.08),
                  "drag": jnp.asarray([0.15, 0.12, 0.25])}
    measured = jax.jit(rollout)(true_theta)

    def loss_fn(log_theta):
        theta = jax.tree_util.tree_map(jnp.exp, log_theta)
        return jnp.mean((rollout(theta) - measured) ** 2)

    log_theta = jax.tree_util.tree_map(
        jnp.log, {"tau": jnp.asarray(0.03),
                  "drag": jnp.asarray([0.4, 0.4, 0.08])})
    opt = optax.adam(0.08)
    opt_state = opt.init(log_theta)

    @jax.jit
    def update(lt, os_):
        loss, grads = jax.value_and_grad(loss_fn)(lt)
        upd, os_ = opt.update(grads, os_)
        return optax.apply_updates(lt, upd), os_, loss

    loss0 = float(loss_fn(log_theta))
    for _ in range(300):
        log_theta, opt_state, loss = update(log_theta, opt_state)
    theta = jax.tree_util.tree_map(jnp.exp, log_theta)
    assert float(loss) < 1e-3 * loss0, f"loss {float(loss)} vs init {loss0}"
    np.testing.assert_allclose(float(theta["tau"]), 0.08, rtol=0.05)
    np.testing.assert_allclose(np.asarray(theta["drag"]),
                               [0.15, 0.12, 0.25], rtol=0.15, atol=0.02)
