"""Floating-base articulated dynamics (sim/articulated.py) validation.

What the reference gets from PhysX articulation for snakey/morphy —
configuration-dependent inertia, joint reaction wrenches on the base, motor
moment arms that move with the links (base_reconfigurable.py,
robot_manager.py:441-468) — is reproduced here by a CRBA/RNEA solver and
validated against independent ground truth:

  * a 1-DoF pendulum vs the exact ODE integrated by the same symplectic
    scheme (solver-correctness to ~float precision),
  * momentum conservation of a free-floating snakey with moving joints,
    checked with an INDEPENDENT numpy forward-kinematics implementation,
  * moment arms: deflecting one morphy arm under equal thrusts must torque
    the base (the decoupled round-1 model could not produce this).
"""

import copy
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag  # noqa: F401  (registers configs)
from aerial_gym_simulator_tpu.assets.articulation import parse_articulation
from aerial_gym_simulator_tpu.config.robot_config import catalog
from aerial_gym_simulator_tpu.config.robot_config import reconfigurable_urdf as rurdf
from aerial_gym_simulator_tpu.config.robot_config.base_quad_config import (
    ControlAllocatorConfig,
    MotorModelConfig,
    ReconfigurationConfig,
    RobotConfig,
)
from aerial_gym_simulator_tpu.registry.registries import (
    controller_registry,
    env_config_registry,
    sim_config_registry,
)
from aerial_gym_simulator_tpu.sim import dynamics
from aerial_gym_simulator_tpu.sim.params import build_sim_params, initial_state

_REF = "/root/reference/resources/robots"


def _build(robot_cfg, sim_name="base_sim", env_name="empty_env",
           ctrl="no_control", num_envs=2, seed=0):
    sim_cfg = sim_config_registry.make(sim_name)
    env_cfg = env_config_registry.make(env_name)
    ctrl_cfg = controller_registry.make(ctrl)
    if ctrl == "no_control":
        ctrl_cfg.num_actions = robot_cfg.control_allocator_config.num_motors
    params = build_sim_params(sim_cfg, env_cfg, robot_cfg, ctrl_cfg,
                              num_envs=num_envs)
    return params, initial_state(params, seed=seed)


# ---------------------------------------------------------------------------
# URDF data parity vs the reference's shipped robots
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference not present")
@pytest.mark.parametrize("name,mine", [
    ("snakey/model.urdf", rurdf.snakey_urdf(4)),
    ("snakey5/model.urdf", rurdf.snakey_urdf(5)),
    ("snakey6/model.urdf", rurdf.snakey_urdf(6)),
    ("morphy/morphy.urdf", rurdf.morphy_urdf()),
])
def test_urdf_parity_vs_reference(name, mine):
    ref = parse_articulation(open(os.path.join(_REF, name)).read())
    got = parse_articulation(mine)
    assert got.nb == ref.nb and got.parent == ref.parent
    assert got.motor_body == ref.motor_body
    for f in ("R_tree", "t_tree", "axis", "lower", "upper", "effort",
              "velocity", "mass", "com", "inertia", "base_com",
              "base_inertia", "motor_pos", "motor_dir"):
        np.testing.assert_allclose(getattr(got, f), getattr(ref, f),
                                   atol=1e-9, err_msg=f)
    assert abs(got.base_mass - ref.base_mass) < 1e-12


# ---------------------------------------------------------------------------
# ground truth: fixed-base pendulum
# ---------------------------------------------------------------------------

_PENDULUM_URDF = """<?xml version="1.0"?>
<robot name="pendulum">
  <link name="base_link">
    <inertial><origin xyz="0 0 0" rpy="0 0 0"/><mass value="0.5"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
  </link>
  <link name="motor0">
    <inertial><origin xyz="0 0 0" rpy="0 0 0"/><mass value="0.0"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
  </link>
  <joint name="base_to_motor0" type="fixed">
    <parent link="base_link"/><child link="motor0"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
  </joint>
  <link name="bob">
    <inertial><origin xyz="0.3 0 0" rpy="0 0 0"/><mass value="0.2"/>
      <inertia ixx="0" ixy="0" ixz="0" iyy="0" iyz="0" izz="0"/>
    </inertial>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base_link"/><child link="bob"/>
    <origin xyz="0 0 0" rpy="0 0 0"/>
    <axis xyz="0 1 0"/>
    <limit lower="-9.0" upper="9.0" effort="100.0" velocity="100.0"/>
  </joint>
</robot>
"""


def _pendulum_cfg(armature=0.0):
    cfg = RobotConfig(name="pendulum")
    cfg.control_allocator_config = ControlAllocatorConfig(
        num_motors=1, application_mask=[1], motor_directions=[1],
        allocation_matrix=[[0.0]] * 6,
        motor_model_config=MotorModelConfig(use_rps=False, max_thrust=0.0,
                                            min_thrust=0.0),
    )
    cfg.dof_config = ReconfigurationConfig(
        dof_mode="effort", arm_response="pd",
        init_state_min=[[0.0], [0.0]], init_state_max=[[0.0], [0.0]],
        stiffness=[0.0], damping=[0.0], dof_inertia=[0.2 * 0.09],
    )
    cfg.articulation_urdf = _PENDULUM_URDF
    cfg.robot_asset.fix_base_link = True
    cfg.robot_asset.armature = armature
    cfg.disturbance.enable_disturbance = False
    return cfg


def test_pendulum_matches_ground_truth():
    """Articulated solver == exact pendulum ODE under the same symplectic
    Euler scheme: theta_dd = m g l cos(theta) / (m l^2 + armature)."""
    armature = 1e-4
    params, state = _build(_pendulum_cfg(armature), num_envs=2)
    state = state.replace(pos=state.pos + jnp.array([0.0, 0.0, 5.0]))
    dt = float(params.dt)
    m, l, g = 0.2, 0.3, 9.81

    step = jax.jit(lambda s: dynamics.env_step(
        params, s, jnp.zeros((2, 1), jnp.float32)))
    traj = []
    for _ in range(300):
        state = step(s=state)
        traj.append(np.asarray(state.dof_pos)[:, 0])
    traj = np.stack(traj)
    assert np.isfinite(traj).all()
    np.testing.assert_allclose(traj[:, 0], traj[:, 1])  # env-invariant

    th, thd = 0.0, 0.0
    ref = []
    J = m * l * l + armature
    for _ in range(300):
        thd += dt * (m * g * l * math.cos(th)) / J
        th += dt * thd
        ref.append(th)
    np.testing.assert_allclose(traj[:, 0], np.array(ref), atol=2e-3)
    # the pendulum genuinely swings (non-trivial trajectory)
    assert np.abs(traj).max() > 0.5


# ---------------------------------------------------------------------------
# momentum conservation of a free-floating snakey (independent numpy FK)
# ---------------------------------------------------------------------------


def _rot_axis_np(axis, q):
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + math.sin(q) * K + (1 - math.cos(q)) * (K @ K)


def _total_momentum_np(model, quat, pos, linvel, angvel, q, qd):
    """Independent FK: total linear momentum and angular momentum about the
    world origin of base + all moving bodies."""
    from aerial_gym_simulator_tpu.utils.math import quat_to_rotation_matrix
    Rb = np.asarray(quat_to_rotation_matrix(jnp.asarray(quat)))
    w_base = angvel                                  # world
    P = model.base_mass * (linvel + np.cross(
        w_base, Rb @ model.base_com))
    c_base_w = pos + Rb @ model.base_com
    Ib_w = Rb @ model.base_inertia @ Rb.T
    L = (Ib_w @ w_base + model.base_mass
         * np.cross(c_base_w, linvel + np.cross(w_base, Rb @ model.base_com)))
    R = {-1: Rb}
    o = {-1: pos}
    w = {-1: w_base}
    v = {-1: linvel}                                  # velocity of body origin
    for i in range(model.nb):
        p = model.parent[i]
        Rj = model.R_tree[i] @ _rot_axis_np(model.axis[i], q[i])
        o[i] = o[p] + R[p] @ model.t_tree[i]
        v[i] = v[p] + np.cross(w[p], R[p] @ model.t_tree[i])
        R[i] = R[p] @ Rj
        w[i] = w[p] + R[i] @ (model.axis[i] * qd[i])
        c_w = o[i] + R[i] @ model.com[i]
        v_c = v[i] + np.cross(w[i], R[i] @ model.com[i])
        P = P + model.mass[i] * v_c
        I_w = R[i] @ model.inertia[i] @ R[i].T
        L = L + I_w @ w[i] + model.mass[i] * np.cross(c_w, v_c)
    return P, L


def test_free_floating_momentum_conservation():
    """No gravity, no thrust, engine damping off: internal joint motion and
    joint drives must conserve total linear AND angular momentum (i.e. the
    joint reaction wrenches on the base obey Newton's third law)."""
    cfg = catalog.snakey()
    cfg.disturbance.enable_disturbance = False
    cfg.robot_asset.linear_damping = 0.0
    cfg.robot_asset.angular_damping = 0.0
    params, state = _build(cfg, sim_name="base_sim_no_gravity", num_envs=1)
    model = parse_articulation(cfg.articulation_urdf)

    # bent configuration, joints and base in motion (away from limits);
    # snakey's velocity drives (damping 10) pin qd to the target within
    # ~10 ms, so command a nonzero joint-rate target to KEEP joints moving —
    # drive torques are internal forces and must conserve total momentum
    q0 = jnp.array([[0.4, 0.1, -0.3, 0.2, 0.5, -0.1]], jnp.float32)
    qd0 = jnp.array([[0.2, -0.15, 0.2, 0.1, -0.2, 0.15]], jnp.float32)
    state = state.replace(
        pos=jnp.array([[0.0, 0.0, 5.0]], jnp.float32),
        linvel=jnp.array([[0.2, -0.1, 0.15]], jnp.float32),
        angvel=jnp.array([[0.1, 0.2, -0.15]], jnp.float32),
        dof_pos=q0, dof_vel=qd0, dof_vel_target=qd0)

    def mom(s):
        return _total_momentum_np(
            model, np.asarray(s.quat)[0], np.asarray(s.pos)[0],
            np.asarray(s.linvel)[0], np.asarray(s.angvel)[0],
            np.asarray(s.dof_pos)[0], np.asarray(s.dof_vel)[0])

    P0, L0 = mom(state)
    step = jax.jit(lambda s: dynamics.env_step(
        params, s, jnp.zeros((1, 4), jnp.float32)))
    for _ in range(50):
        state = step(s=state)
    P1, L1 = mom(state)
    # joints moved substantially (tracking the commanded joint rates)
    assert float(jnp.abs(state.dof_pos - q0).max()) > 0.05
    np.testing.assert_allclose(P1, P0, atol=2e-3)
    np.testing.assert_allclose(L1, L0, atol=2e-2)
    assert np.isfinite(np.asarray(state.pos)).all()


# ---------------------------------------------------------------------------
# moment arms move with the links (morphy)
# ---------------------------------------------------------------------------


def _morphy_cfg_quiet():
    cfg = catalog.morphy()
    cfg.disturbance.enable_disturbance = False
    cfg.robot_asset.linear_damping = 0.0
    cfg.robot_asset.angular_damping = 0.0
    return cfg


def test_deflected_arm_torques_base():
    """Equal thrusts: symmetric arms leave the base level; one deflected arm
    moves its motor, so the same thrusts now torque the base. The decoupled
    round-1 model (static allocation matrix) cannot produce this."""
    cfg = _morphy_cfg_quiet()
    params, state = _build(cfg, sim_name="base_sim_no_gravity", num_envs=2)
    state = state.replace(pos=state.pos + jnp.array([0.0, 0.0, 5.0]))
    # pin arms: zero stiffness response would let arms move; deflect arm 0's
    # flap joint on env 1 only
    dof = state.dof_pos.at[1, 0].set(0.24)
    state = state.replace(dof_pos=dof)

    thrust_cmd = jnp.full((2, 4), 0.6, jnp.float32)
    step = jax.jit(lambda s: dynamics.env_step(params, s, thrust_cmd))
    for _ in range(20):
        state = step(s=state)
    w = np.asarray(state.angvel)
    # symmetric env: tiny residual spin; deflected env: clearly torqued
    assert np.linalg.norm(w[1]) > 5.0 * max(np.linalg.norm(w[0]), 1e-3), w


def test_morphy_arms_settle_under_gravity():
    """Fixed-base morphy (arm sys-id rig): passive arms released at 0.29 rad
    settle to the spring/gravity equilibrium with finite state everywhere
    (reference morphy_config.py MorphyFixedBaseCfg semantics)."""
    cfg = catalog.morphy_fixed_base()
    params, state = _build(cfg, num_envs=1)
    state = state.replace(
        dof_pos=jnp.tile(jnp.array([[0.29, 0.0] * 4], jnp.float32), (1, 1)))
    step = jax.jit(lambda s: dynamics.env_step(
        params, s, jnp.zeros((1, 4), jnp.float32)))
    for _ in range(300):
        state = step(s=state)
    q = np.asarray(state.dof_pos)
    qd = np.asarray(state.dof_vel)
    assert np.isfinite(q).all() and np.isfinite(qd).all()
    assert np.abs(qd).max() < 0.2, "arms should be near rest"
    assert np.abs(q).max() <= 0.25 + 1e-5, "within URDF limits"
    # base clamped
    assert float(jnp.abs(state.linvel).max()) == 0.0


def test_snakey6_closed_loop_smoke():
    """snakey6 free flight with motor commands: finite state, joints within
    URDF limits, base responds to thrust."""
    cfg = catalog.snakey6()
    cfg.disturbance.enable_disturbance = False
    params, state = _build(cfg, num_envs=2)
    state = state.replace(pos=state.pos + jnp.array([0.0, 0.0, 5.0]))
    act = jnp.full((2, 6), 3.2, jnp.float32)  # ~hover-ish total thrust
    step = jax.jit(lambda s: dynamics.env_step(params, s, act))
    for _ in range(50):
        state = step(s=state)
    assert np.isfinite(np.asarray(state.pos)).all()
    assert np.isfinite(np.asarray(state.dof_pos)).all()
    lo = np.asarray(params.dof.lower_limit) - 1e-5
    hi = np.asarray(params.dof.upper_limit) + 1e-5
    q = np.asarray(state.dof_pos)
    assert (q >= lo).all() and (q <= hi).all()
