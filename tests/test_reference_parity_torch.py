"""Differential parity vs the REFERENCE's own torch modules.

Loads /root/reference's pure-torch math library (aerial_gym/utils/math.py)
and motor model (aerial_gym/control/motor_model.py) standalone on CPU and
checks this framework's JAX implementations produce the same numbers on
random batches. Skipped when the reference checkout is absent.

This is execution-level parity evidence: the reference code itself is the
oracle, not a reimplementation of it.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/aerial_gym"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from aerial_gym_simulator_tpu.utils import math as ours  # noqa: E402


def _load_ref_module(name, relpath, extra_modules=None):
    """Load a reference module by file path without importing the
    aerial_gym package (which needs isaacgym)."""
    if "pytorch3d" not in sys.modules:
        # math.py imports (but never calls, in the functions under test)
        # pytorch3d.transforms.matrix_to_quaternion
        p3d = types.ModuleType("pytorch3d")
        tr = types.ModuleType("pytorch3d.transforms")

        def _unavailable(*a, **k):
            raise NotImplementedError("pytorch3d stub")

        tr.matrix_to_quaternion = _unavailable
        p3d.transforms = tr
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.transforms"] = tr
    for mod_name, mod in (extra_modules or {}).items():
        sys.modules.setdefault(mod_name, mod)
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def ref_math():
    return _load_ref_module("ref_math", "utils/math.py")


@pytest.fixture(scope="module")
def ref_motor(ref_math):
    # motor_model.py does `from aerial_gym.utils.math import ...`; satisfy
    # it with fake package entries pointing at the standalone-loaded module
    pkg = types.ModuleType("aerial_gym")
    utils = types.ModuleType("aerial_gym.utils")
    fakes = {"aerial_gym": pkg, "aerial_gym.utils": utils,
             "aerial_gym.utils.math": ref_math}
    return _load_ref_module("ref_motor", "control/motor_model.py",
                            extra_modules=fakes)


def _rand_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _rand(n, d, seed=1, scale=2.0):
    rng = np.random.default_rng(seed)
    return (scale * rng.normal(size=(n, d))).astype(np.float32)


N = 256


def _cmp(ref_out, our_out, atol=2e-5, rtol=2e-5):
    np.testing.assert_allclose(np.asarray(our_out),
                               ref_out.detach().cpu().numpy(),
                               atol=atol, rtol=rtol)


def test_quaternion_algebra_matches_reference(ref_math):
    qa, qb = _rand_quats(N, 0), _rand_quats(N, 1)
    v = _rand(N, 3, 2)
    ta, tb = torch.from_numpy(qa), torch.from_numpy(qb)
    tv = torch.from_numpy(v)
    ja, jb, jv = jnp.asarray(qa), jnp.asarray(qb), jnp.asarray(v)

    _cmp(ref_math.quat_mul(ta, tb), ours.quat_mul(ja, jb))
    _cmp(ref_math.quat_conjugate(ta), ours.quat_conjugate(ja))
    _cmp(ref_math.quat_inverse(ta), ours.quat_inverse(ja))
    _cmp(ref_math.quat_unit(ta), ours.quat_unit(ja))
    _cmp(ref_math.quat_rotate(ta, tv), ours.quat_rotate(ja, jv))
    _cmp(ref_math.quat_rotate_inverse(ta, tv),
         ours.quat_rotate_inverse(ja, jv))
    _cmp(ref_math.quat_apply(ta, tv), ours.tf_vector(ja, jv))
    _cmp(ref_math.quat_apply_inverse(ta, tv),
         ours.quat_apply_inverse(ja, jv))
    for axis in range(3):
        _cmp(ref_math.quat_axis(ta, axis), ours.quat_axis(ja, axis))
    _cmp(ref_math.quat_to_rotation_matrix(ta),
         ours.quat_to_rotation_matrix(ja), atol=1e-5)


def test_euler_conversions_match_reference(ref_math):
    q = _rand_quats(N, 3)
    tq, jq = torch.from_numpy(q), jnp.asarray(q)
    r_ref, p_ref, y_ref = ref_math.get_euler_xyz(tq)
    r, p, y = ours.get_euler_xyz(jq)
    _cmp(r_ref, r, atol=1e-4)
    _cmp(p_ref, p, atol=1e-4)
    _cmp(y_ref, y, atol=1e-4)
    _cmp(ref_math.get_euler_xyz_tensor(tq), ours.get_euler_xyz_tensor(jq),
         atol=1e-4)

    rpy = _rand(N, 3, 4, scale=1.0)
    trpy, jrpy = torch.from_numpy(rpy), jnp.asarray(rpy)
    _cmp(ref_math.quat_from_euler_xyz(trpy[:, 0], trpy[:, 1], trpy[:, 2]),
         ours.quat_from_euler_xyz(jrpy[:, 0], jrpy[:, 1], jrpy[:, 2]))
    _cmp(ref_math.quat_from_euler_xyz_tensor(trpy),
         ours.quat_from_euler_xyz_tensor(jrpy))
    _cmp(ref_math.vehicle_frame_quat_from_quat(tq),
         ours.vehicle_frame_quat_from_quat(jq), atol=1e-4)

    angle = torch.from_numpy(_rand(N, 1, 5, scale=3.0)[:, 0])
    axis = torch.from_numpy(_rand(N, 3, 6))
    _cmp(ref_math.quat_from_angle_axis(angle, axis),
         ours.quat_from_angle_axis(jnp.asarray(angle.numpy()),
                                   jnp.asarray(axis.numpy())))


def test_scalar_helpers_match_reference(ref_math):
    x = _rand(N, 3, 7, scale=5.0)
    tx, jx = torch.from_numpy(x), jnp.asarray(x)
    _cmp(ref_math.ssa(tx), ours.ssa(jx))
    _cmp(ref_math.normalize_angle(tx), ours.normalize_angle(jx))
    _cmp(ref_math.normalize(tx), ours.normalize(jx))

    lo = torch.from_numpy(_rand(N, 3, 8) - 5.0)
    hi = lo + torch.rand(N, 3) * 4.0 + 0.1
    jlo, jhi = jnp.asarray(lo.numpy()), jnp.asarray(hi.numpy())
    _cmp(ref_math.tensor_clamp(tx, lo, hi), ours.tensor_clamp(jx, jlo, jhi))
    _cmp(ref_math.scale(tx, lo, hi), ours.scale_transform(jx, jlo, jhi))
    _cmp(ref_math.unscale(tx, lo, hi), ours.unscale_transform(jx, jlo, jhi))
    ratio = torch.rand(N, 3)
    _cmp(ref_math.torch_interpolate_ratio(lo, hi, ratio),
         ours.interpolate_ratio(jlo, jhi, jnp.asarray(ratio.numpy())))

    _cmp(ref_math.exponential_reward_function(3.5, 0.7, tx),
         ours.exponential_reward(3.5, 0.7, jx))
    _cmp(ref_math.exponential_penalty_function(3.5, 0.7, tx),
         ours.exponential_penalty(3.5, 0.7, jx))

    pe, ve = _rand(N, 3, 9), _rand(N, 3, 10)
    kp, kd = np.abs(_rand(N, 3, 11)), np.abs(_rand(N, 3, 12))
    _cmp(ref_math.pd_control(torch.from_numpy(pe), torch.from_numpy(ve),
                             torch.from_numpy(kp), torch.from_numpy(kd)),
         ours.pd_control(jnp.asarray(pe), jnp.asarray(ve),
                         jnp.asarray(kp), jnp.asarray(kd)))


def test_transforms_and_vee_match_reference(ref_math):
    q1, q2 = _rand_quats(N, 13), _rand_quats(N, 14)
    t1, t2, v = _rand(N, 3, 15), _rand(N, 3, 16), _rand(N, 3, 17)
    tq1, tq2 = torch.from_numpy(q1), torch.from_numpy(q2)
    tt1, tt2, tv = (torch.from_numpy(t1), torch.from_numpy(t2),
                    torch.from_numpy(v))
    jq1, jq2 = jnp.asarray(q1), jnp.asarray(q2)
    jt1, jt2, jv = jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(v)

    _cmp(ref_math.tf_apply(tq1, tt1, tv), ours.tf_apply(jq1, jt1, jv))
    _cmp(ref_math.tf_vector(tq1, tv), ours.tf_vector(jq1, jv))
    rq, rt = ref_math.tf_inverse(tq1, tt1)
    oq, ot = ours.tf_inverse(jq1, jt1)
    _cmp(rq, oq)
    _cmp(rt, ot)
    rq, rt = ref_math.tf_combine(tq1, tt1, tq2, tt2)
    oq, ot = ours.tf_combine(jq1, jt1, jq2, jt2)
    _cmp(rq, oq)
    _cmp(rt, ot)
    _cmp(ref_math.get_basis_vector(tq1, tv), ours.get_basis_vector(jq1, jv))

    # vee map of a batch of skew matrices
    w = _rand(N, 3, 18)
    skew = np.zeros((N, 3, 3), np.float32)
    skew[:, 0, 1], skew[:, 0, 2] = -w[:, 2], w[:, 1]
    skew[:, 1, 0], skew[:, 1, 2] = w[:, 2], -w[:, 0]
    skew[:, 2, 0], skew[:, 2, 1] = -w[:, 1], w[:, 0]
    _cmp(ref_math.compute_vee_map(torch.from_numpy(skew)),
         ours.compute_vee_map(jnp.asarray(skew)))


# ---------------------------------------------------------------------------
# motor model: step the reference's torch MotorModel and our motor_step side
# by side over a command sequence (all 2x2x2 mode combinations)
# ---------------------------------------------------------------------------


def _motor_cfg(use_rps, use_discrete, scheme):
    return types.SimpleNamespace(
        max_thrust=2.0, min_thrust=0.1, max_thrust_rate=100000.0,
        motor_time_constant_increasing_min=0.04,
        motor_time_constant_increasing_max=0.04,
        motor_time_constant_decreasing_min=0.08,
        motor_time_constant_decreasing_max=0.08,
        use_rps=use_rps,
        motor_thrust_constant_min=8.5e-6,
        motor_thrust_constant_max=8.5e-6,
        use_discrete_approximation=use_discrete,
        integration_scheme=scheme,
    )


@pytest.mark.parametrize("use_rps", [False, True])
@pytest.mark.parametrize("use_discrete", [False, True])
@pytest.mark.parametrize("scheme", ["euler", "rk4"])
def test_motor_model_trajectory_matches_reference(ref_motor, use_rps,
                                                  use_discrete, scheme):
    from aerial_gym_simulator_tpu.sim.structs import MotorParams

    n_envs, n_motors, dt, steps = 3, 4, 0.01, 60
    cfg = _motor_cfg(use_rps, use_discrete, scheme)
    ref = ref_motor.MotorModel(n_envs, n_motors, dt, cfg, device="cpu")

    rng = np.random.default_rng(42)
    init = rng.uniform(0.2, 1.8, size=(n_envs, n_motors)).astype(np.float32)
    ref.current_motor_thrust = torch.from_numpy(init.copy())

    alloc = np.zeros((6, n_motors), np.float32)
    p = MotorParams(
        allocation_matrix=jnp.asarray(alloc),
        allocation_pinv=jnp.asarray(alloc.T),
        motor_directions=jnp.ones((n_motors,)),
        min_thrust=jnp.float32(cfg.min_thrust),
        max_thrust=jnp.float32(cfg.max_thrust),
        max_thrust_rate=jnp.float32(cfg.max_thrust_rate),
        tau_inc_min=jnp.float32(0.04), tau_inc_max=jnp.float32(0.04),
        tau_dec_min=jnp.float32(0.08), tau_dec_max=jnp.float32(0.08),
        thrust_constant_min=jnp.float32(cfg.motor_thrust_constant_min),
        thrust_constant_max=jnp.float32(cfg.motor_thrust_constant_max),
        thrust_to_torque_ratio=jnp.float32(0.016),
        use_rps=use_rps, use_discrete_approximation=use_discrete,
        integration_scheme=scheme, num_motors=n_motors,
    )
    cur = jnp.asarray(init)
    tau_inc = jnp.full((n_envs, n_motors), 0.04, jnp.float32)
    tau_dec = jnp.full((n_envs, n_motors), 0.08, jnp.float32)
    kt = jnp.full((n_envs, n_motors), cfg.motor_thrust_constant_min,
                  jnp.float32)

    from aerial_gym_simulator_tpu.ops.motor_model import motor_step
    for i in range(steps):
        cmd = rng.uniform(0.0, 2.2, size=(n_envs, n_motors)).astype(np.float32)
        ref_out = ref.update_motor_thrusts(torch.from_numpy(cmd.copy()))
        ref.current_motor_thrust = ref_out.clone()
        cur = motor_step(p, dt, jnp.asarray(cmd), cur, tau_inc, tau_dec, kt)
        np.testing.assert_allclose(
            np.asarray(cur), ref_out.detach().numpy(), atol=3e-5, rtol=3e-5,
            err_msg=f"step {i} rps={use_rps} disc={use_discrete} {scheme}")


# ---------------------------------------------------------------------------
# Lee controller family: drive the reference controller CLASSES on CPU with
# a hand-built global_tensor_dict and compare output wrenches to ours
# ---------------------------------------------------------------------------


def _torch_matrix_to_quaternion(m):
    """wxyz quaternion from rotation matrix (pytorch3d-compatible output;
    quaternion sign is irrelevant downstream — torque math is sign-
    invariant). Shepperd's method, batched."""
    t = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]
    w = torch.sqrt(torch.clamp(1.0 + t, min=1e-12)) / 2.0
    x = (m[..., 2, 1] - m[..., 1, 2]) / (4.0 * w)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (4.0 * w)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (4.0 * w)
    q = torch.stack([w, x, y, z], dim=-1)
    return q / q.norm(dim=-1, keepdim=True)


@pytest.fixture(scope="module")
def ref_controllers():
    if "pytorch3d" not in sys.modules:
        p3d = types.ModuleType("pytorch3d")
        p3d.transforms = types.ModuleType("pytorch3d.transforms")
        sys.modules["pytorch3d"] = p3d
        sys.modules["pytorch3d.transforms"] = p3d.transforms
    sys.modules["pytorch3d.transforms"].matrix_to_quaternion = \
        _torch_matrix_to_quaternion
    import importlib

    def fake_pkg(name, path):
        # the motor fixture may have registered a plain (non-package) stub;
        # make sure whatever is there carries a __path__ for submodule import
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        m.__path__ = [path]

    fake_pkg("aerial_gym", REF)
    fake_pkg("aerial_gym.utils", os.path.join(REF, "utils"))
    fake_pkg("aerial_gym.control", os.path.join(REF, "control"))
    fake_pkg("aerial_gym.control.controllers",
             os.path.join(REF, "control/controllers"))
    mods = {}
    for name in ("position_control", "velocity_control", "attitude_control",
                 "acceleration_control", "velocity_steeing_angle_controller",
                 "fully_actuated_control"):
        mods[name] = importlib.import_module(
            f"aerial_gym.control.controllers.{name}")
    return mods


class _LeeCfg:
    num_actions = 4
    max_inclination_angle_rad = np.pi / 3.0
    max_yaw_rate = np.pi / 3.0  # reference lee_controller_config.py:19
    K_pos_tensor_max = [3.0, 3.0, 2.0]
    K_pos_tensor_min = [2.0, 2.0, 1.0]
    K_vel_tensor_max = [3.0, 3.0, 3.0]
    K_vel_tensor_min = [2.0, 2.0, 2.0]
    K_rot_tensor_max = [1.2, 1.2, 0.6]
    K_rot_tensor_min = [0.8, 0.8, 0.4]
    K_angvel_tensor_max = [0.2, 0.2, 0.2]
    K_angvel_tensor_min = [0.1, 0.1, 0.1]
    randomize_params = False


def _make_ref_controller(cls, n, mass, inertia, ref_math):
    """Instantiate a reference controller over a CPU tensor dict built the
    same way base_multirotor.update_states builds derived states."""
    rng = np.random.default_rng(99)
    pos = torch.from_numpy(rng.normal(0, 2, (n, 3)).astype(np.float32))
    quat = torch.from_numpy(_rand_quats(n, 77))
    linvel = torch.from_numpy(rng.normal(0, 1.5, (n, 3)).astype(np.float32))
    angvel = torch.from_numpy(rng.normal(0, 1.0, (n, 3)).astype(np.float32))
    vq = ref_math.vehicle_frame_quat_from_quat(quat)
    gdict = {
        "robot_position": pos,
        "robot_orientation": quat,
        "robot_linvel": linvel,
        "robot_angvel": angvel,
        "robot_vehicle_orientation": vq,
        "robot_vehicle_linvel": ref_math.quat_rotate_inverse(vq, linvel),
        "robot_body_linvel": ref_math.quat_rotate_inverse(quat, linvel),
        "robot_body_angvel": ref_math.quat_rotate_inverse(quat, angvel),
        "robot_euler_angles": ref_math.ssa(ref_math.get_euler_xyz_tensor(quat)),
        "robot_mass": torch.full((n,), mass),
        "robot_inertia": torch.from_numpy(
            np.tile(inertia, (n, 1, 1)).astype(np.float32)),
        "gravity": torch.tensor([[0.0, 0.0, -9.81]]).expand(n, 3),
    }
    ctrl = cls(_LeeCfg(), n, "cpu")
    ctrl.init_tensors(gdict)
    return ctrl, (pos, quat, linvel, angvel)


_CTRL_PAIRS = [
    ("position_control", "LeePositionController", "lee_position_control", 4),
    ("velocity_control", "LeeVelocityController", "lee_velocity_control", 4),
    ("attitude_control", "LeeAttitudeController", "lee_attitude_control", 4),
    ("acceleration_control", "LeeAccelerationController",
     "lee_acceleration_control", 4),
    ("velocity_steeing_angle_controller", "LeeVelocitySteeringAngleController",
     "lee_velocity_steering_angle_control", 4),
    ("fully_actuated_control", "FullyActuatedController",
     "fully_actuated_control", 7),
]
# NOT differentially tested: rates_control — the reference's
# `(cmd[:,0] - self.gravity) * self.mass` (rates_control.py:26) raises a
# shape error when executed ((N,) minus (N,3)); our lee_rates_control
# implements the intended hover-normalized semantics instead.


@pytest.mark.parametrize("mod,cls,ours_name,adim", _CTRL_PAIRS)
def test_lee_controller_wrench_matches_reference(ref_controllers, ref_math,
                                                 mod, cls, ours_name, adim):
    from aerial_gym_simulator_tpu.control import controllers as C
    from aerial_gym_simulator_tpu.sim.structs import (ControllerParams,
                                                      RobotParams)

    n, mass = 64, 0.25
    inertia = np.diag([1.5e-3, 1.4e-3, 2.7e-3]).astype(np.float32)
    ctrl, (pos, quat, linvel, angvel) = _make_ref_controller(
        getattr(ref_controllers[mod], cls), n, mass, inertia, ref_math)

    rng = np.random.default_rng(5)
    action = rng.uniform(-1.0, 1.0, (n, adim)).astype(np.float32)
    if adim == 7:  # fully-actuated: normalized target quat in action[3:7]
        action[:, 3:7] = _rand_quats(n, 11)
    ref_wrench = ctrl.update(torch.from_numpy(action.copy()))

    cp = ControllerParams(
        K_pos_min=jnp.asarray(_LeeCfg.K_pos_tensor_min),
        K_pos_max=jnp.asarray(_LeeCfg.K_pos_tensor_max),
        K_vel_min=jnp.asarray(_LeeCfg.K_vel_tensor_min),
        K_vel_max=jnp.asarray(_LeeCfg.K_vel_tensor_max),
        K_rot_min=jnp.asarray(_LeeCfg.K_rot_tensor_min),
        K_rot_max=jnp.asarray(_LeeCfg.K_rot_tensor_max),
        K_angvel_min=jnp.asarray(_LeeCfg.K_angvel_tensor_min),
        K_angvel_max=jnp.asarray(_LeeCfg.K_angvel_tensor_max),
        max_yaw_rate=jnp.float32(_LeeCfg.max_yaw_rate),
        max_inclination_angle=jnp.float32(_LeeCfg.max_inclination_angle_rad),
        randomize_params=False,
        num_actions=adim,
        name=ours_name,
    )
    rp_kwargs = dict(mass=jnp.float32(mass), inertia=jnp.asarray(inertia))
    obs = C.compute_robot_obs(jnp.asarray(pos.numpy()),
                              jnp.asarray(quat.numpy()),
                              jnp.asarray(linvel.numpy()),
                              jnp.asarray(angvel.numpy()))
    gains = C.Gains(
        K_pos=(cp.K_pos_min + cp.K_pos_max) / 2.0,
        K_vel=(cp.K_vel_min + cp.K_vel_max) / 2.0,
        K_rot=(cp.K_rot_min + cp.K_rot_max) / 2.0,
        K_angvel=(cp.K_angvel_min + cp.K_angvel_max) / 2.0,
    )
    rp = _robot_params_for_test(**rp_kwargs)
    ours_wrench = C.controller_update(ours_name, cp, rp,
                                      jnp.asarray([0.0, 0.0, -9.81]),
                                      obs, gains, jnp.asarray(action))
    np.testing.assert_allclose(np.asarray(ours_wrench),
                               ref_wrench.detach().numpy(),
                               atol=5e-4, rtol=5e-4)


def _robot_params_for_test(mass, inertia):
    """Minimal RobotParams stand-in: controller math only touches mass and
    inertia."""
    from aerial_gym_simulator_tpu.sim.structs import RobotParams
    import dataclasses
    fields = {f.name for f in dataclasses.fields(RobotParams)}
    kwargs = {}
    if "mass" in fields:
        kwargs["mass"] = mass
    if "inertia" in fields:
        kwargs["inertia"] = inertia
        kwargs["inv_inertia"] = jnp.linalg.inv(inertia)
    # fill any other required array fields with zeros of a safe shape
    for f in dataclasses.fields(RobotParams):
        if f.name in kwargs:
            continue
        if f.default is dataclasses.MISSING and \
                f.default_factory is dataclasses.MISSING:  # type: ignore
            kwargs[f.name] = jnp.zeros((3,))
    return RobotParams(**kwargs)


# ---------------------------------------------------------------------------
# task reward functions: load the reference task modules (heavy deps
# stubbed) and compare the @torch.jit.script reward kernels with ours
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_task_modules(ref_controllers):
    """Import the 3 reference task modules with isaacgym-touching imports
    stubbed (BaseTask/SimBuilder/VAE are only used at class-instantiation
    time, never by the module-level jit reward kernels under test)."""
    import importlib

    def stub_mod(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def pkg(name, path):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        m.__path__ = [path]
        return m

    pkg("aerial_gym.task", os.path.join(REF, "task"))
    pkg("aerial_gym.task.position_setpoint_task",
        os.path.join(REF, "task/position_setpoint_task"))
    pkg("aerial_gym.task.navigation_task",
        os.path.join(REF, "task/navigation_task"))
    pkg("aerial_gym.task.lidar_navigation_task",
        os.path.join(REF, "task/lidar_navigation_task"))
    pkg("aerial_gym.sim", os.path.join(REF, "sim"))
    pkg("aerial_gym.utils.vae", os.path.join(REF, "utils/vae"))
    stub_mod("aerial_gym.task.base_task", BaseTask=object)
    stub_mod("aerial_gym.sim.sim_builder", SimBuilder=object)
    stub_mod("aerial_gym.utils.vae.vae_image_encoder", VAEImageEncoder=object)
    stub_mod("gymnasium")
    gym_spaces = stub_mod("gym.spaces", Dict=dict, Box=object)
    gym_mod = stub_mod("gym")
    gym_mod.spaces = gym_spaces

    return {
        "position": importlib.import_module(
            "aerial_gym.task.position_setpoint_task.position_setpoint_task"),
        "navigation": importlib.import_module(
            "aerial_gym.task.navigation_task.navigation_task"),
        "lidar": importlib.import_module(
            "aerial_gym.task.lidar_navigation_task.lidar_navigation_task"),
    }


def test_position_task_reward_matches_reference(ref_task_modules):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_task as P

    n = 512
    rng = np.random.default_rng(21)
    pos_err = rng.normal(0, 4, (n, 3)).astype(np.float32)  # some dist > 8
    quats = _rand_quats(n, 22)
    angvel = rng.normal(0, 2, (n, 3)).astype(np.float32)
    crashes = (rng.random(n) < 0.1).astype(np.float32)
    linvel = rng.normal(0, 1, (n, 3)).astype(np.float32)
    act = rng.normal(0, 1, (n, 4)).astype(np.float32)

    ref_reward, ref_crashes = ref_task_modules["position"].compute_reward(
        torch.from_numpy(pos_err), torch.from_numpy(linvel),
        torch.from_numpy(quats), torch.from_numpy(angvel),
        torch.from_numpy(crashes.copy()), 1.0,
        torch.from_numpy(act), torch.from_numpy(act),
        {})
    our_reward, our_crashes = P.compute_reward(
        jnp.asarray(pos_err), jnp.asarray(quats), jnp.asarray(angvel),
        jnp.asarray(crashes), crash_dist=8.0)
    np.testing.assert_allclose(np.asarray(our_reward),
                               ref_reward.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(our_crashes), ref_crashes.numpy())


def _np_dict_to_torch(d):
    return {k: torch.tensor(float(v)) for k, v in d.items()}


def test_navigation_task_reward_matches_reference(ref_task_modules):
    from aerial_gym_simulator_tpu.tasks import navigation_task as NT

    cfg = NT.NavigationTaskConfig()
    rp = cfg.reward_parameters
    n = 512
    rng = np.random.default_rng(31)
    pos_err = rng.normal(0, 3, (n, 3)).astype(np.float32)
    prev_err = pos_err + rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    crashes = (rng.random(n) < 0.15).astype(np.float32)
    act = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
    pact = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
    frac = 0.37

    ref_reward, _ = ref_task_modules["navigation"].compute_reward(
        torch.from_numpy(pos_err), torch.from_numpy(prev_err),
        torch.from_numpy(crashes.copy()), torch.from_numpy(act),
        torch.from_numpy(pact), frac, _np_dict_to_torch(rp))
    our_reward = NT.compute_reward(
        rp, jnp.asarray(pos_err), jnp.asarray(prev_err), jnp.asarray(crashes),
        jnp.asarray(act), jnp.asarray(pact), jnp.float32(frac))
    np.testing.assert_allclose(np.asarray(our_reward),
                               ref_reward.numpy(), atol=1e-4, rtol=1e-4)


def test_lidar_navigation_task_reward_matches_reference(ref_task_modules):
    from aerial_gym_simulator_tpu.tasks import lidar_navigation_task as LT

    cfg = LT.LidarNavigationTaskConfig()
    rp = cfg.reward_parameters
    n = 512
    rng = np.random.default_rng(41)
    pos_err = rng.normal(0, 3, (n, 3)).astype(np.float32)
    prev_err = pos_err + rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    vlin = rng.normal(0, 2, (n, 3)).astype(np.float32)
    bang = rng.normal(0, 1, (n, 3)).astype(np.float32)
    yaw_err = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    crashes = (rng.random(n) < 0.15).astype(np.float32)
    act = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
    pact = rng.uniform(-1, 1, (n, 4)).astype(np.float32)
    ttc = rng.uniform(0, 5, n).astype(np.float32)
    frac = 0.61

    ref_reward, _ = ref_task_modules["lidar"].compute_reward(
        torch.from_numpy(pos_err), torch.from_numpy(prev_err),
        torch.from_numpy(vlin), torch.from_numpy(bang),
        torch.from_numpy(yaw_err), torch.from_numpy(crashes.copy()),
        torch.from_numpy(act), torch.from_numpy(pact),
        torch.from_numpy(ttc), frac, _np_dict_to_torch(rp))
    our_reward = LT.compute_reward(
        rp, jnp.asarray(pos_err), jnp.asarray(prev_err), jnp.asarray(vlin),
        jnp.asarray(bang), jnp.asarray(yaw_err), jnp.asarray(crashes),
        jnp.asarray(act), jnp.asarray(pact), jnp.asarray(ttc),
        jnp.float32(frac))
    np.testing.assert_allclose(np.asarray(our_reward),
                               ref_reward.numpy(), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# position-variant task rewards: differential vs the reference's kernels
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_variant_modules(ref_task_modules):
    """Import the 6 position-variant task modules (same stubbing as
    ref_task_modules; the e2e/px4 modules also import more pytorch3d
    names at module scope, never called by the reward kernels)."""
    import importlib

    tr = sys.modules["pytorch3d.transforms"]
    for name in ("euler_angles_to_matrix", "matrix_to_rotation_6d",
                 "quaternion_to_matrix", "matrix_to_euler_angles"):
        if not hasattr(tr, name):
            setattr(tr, name, lambda *a, **k: None)

    def pkg(name, path):
        m = sys.modules.get(name)
        if m is None:
            m = types.ModuleType(name)
            sys.modules[name] = m
        m.__path__ = [path]
        return m

    out = {}
    for short, mod in [
        ("sim2real", "position_setpoint_task_sim2real"),
        ("acceleration", "position_setpoint_task_acceleration_sim2real"),
        ("end_to_end", "position_setpoint_task_sim2real_end_to_end"),
        ("px4", "position_setpoint_task_sim2real_px4"),
        ("reconfigurable", "position_setpoint_task_reconfigurable"),
        ("morphy", "position_setpoint_task_morphy"),
    ]:
        pkg(f"aerial_gym.task.{mod}", os.path.join(REF, "task", mod))
        out[short] = importlib.import_module(f"aerial_gym.task.{mod}.{mod}")
    return out


def _variant_batch(seed, n=512, act_dim=4):
    rng = np.random.default_rng(seed)
    return dict(
        pos_err=rng.normal(0, 3, (n, 3)).astype(np.float32),
        prev_dist=rng.uniform(0, 8, n).astype(np.float32),
        yaw_err=rng.uniform(-np.pi, np.pi, n).astype(np.float32),
        linvel=rng.normal(0, 2, (n, 3)).astype(np.float32),
        angvel=rng.normal(0, 1, (n, 3)).astype(np.float32),
        crashes=(rng.random(n) < 0.1).astype(np.float32),
        act=rng.uniform(-1, 1, (n, act_dim)).astype(np.float32),
        pact=rng.uniform(-1, 1, (n, act_dim)).astype(np.float32),
        quats=_rand_quats(n, seed + 1),
    )


@pytest.mark.parametrize("which", ["sim2real", "acceleration"])
def test_sim2real_variant_rewards_match_reference(ref_variant_modules, which):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    b = _variant_batch(51 if which == "sim2real" else 52)
    t = lambda x: torch.from_numpy(np.array(x))
    ref_reward, ref_crashes = ref_variant_modules[which].compute_reward(
        t(b["pos_err"]), t(b["prev_dist"]), t(b["yaw_err"]), t(b["linvel"]),
        t(b["angvel"]), t(b["crashes"]), 1.0, t(b["act"]), t(b["pact"]), {})
    ours_fn = (V._sim2real_reward if which == "sim2real"
               else V._acceleration_reward)
    our_reward, our_crashes = ours_fn(
        jnp.asarray(b["pos_err"]), jnp.asarray(b["prev_dist"]),
        jnp.asarray(b["yaw_err"]), jnp.asarray(b["linvel"]),
        jnp.asarray(b["angvel"]), jnp.asarray(b["crashes"]),
        jnp.asarray(b["act"]), jnp.asarray(b["pact"]))
    np.testing.assert_allclose(np.asarray(our_reward), ref_reward.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(our_crashes), ref_crashes.numpy())


@pytest.mark.parametrize("which", ["end_to_end", "px4"])
def test_motor_command_variant_rewards_match_reference(ref_variant_modules,
                                                       which):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    b = _variant_batch(61 if which == "end_to_end" else 62)
    prev_pos_err = b["pos_err"] + np.float32(0.2) * b["linvel"]
    crash_dist = 1.5 if which == "end_to_end" else 6.5
    t = lambda x: torch.from_numpy(np.array(x))
    ref_out = ref_variant_modules[which].compute_reward(
        t(b["pos_err"]), t(b["quats"]), t(b["linvel"]), t(b["angvel"]),
        t(b["crashes"]), t(b["act"]), t(b["pact"]), t(prev_pos_err),
        crash_dist)
    ref_reward, ref_crashes = ref_out
    if which == "end_to_end":
        kw = dict(z_scale=11.0, hover_thrust=9.81 * 0.372 / 4.0,
                  closer_gains=(10.0, 15.0), upright2=False,
                  align_gains=(6.0, 0.0), angvel_gain=0.3,
                  act_diff=(1.3, 6.0), crash_dist=crash_dist,
                  closer_big=None)
    else:
        kw = dict(z_scale=13.0, hover_thrust=9.81 * 1.6559999883174896 / 4.0,
                  closer_gains=(50.0, 100.0), upright2=True,
                  align_gains=(4.0, 2.0), angvel_gain=0.75,
                  act_diff=(0.5, 6.0), crash_dist=crash_dist,
                  closer_big=None)
    our_reward, our_crashes = V._motor_command_reward(
        jnp.asarray(b["pos_err"]), jnp.asarray(prev_pos_err),
        jnp.asarray(b["quats"]), jnp.asarray(b["linvel"]),
        jnp.asarray(b["angvel"]), jnp.asarray(b["crashes"]),
        jnp.asarray(b["act"]), jnp.asarray(b["pact"]), **kw)
    np.testing.assert_allclose(np.asarray(our_reward), ref_reward.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(our_crashes), ref_crashes.numpy())


def test_reconfigurable_reward_matches_reference(ref_variant_modules):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    b = _variant_batch(71, act_dim=16)
    t = lambda x: torch.from_numpy(np.array(x))
    ref_reward, ref_crashes = ref_variant_modules["reconfigurable"].compute_reward(
        t(b["pos_err"]), t(b["quats"]), t(b["angvel"]), t(b["crashes"]),
        1.0, t(b["act"]), t(b["pact"]), {})
    our_reward, our_crashes = V._reconfigurable_reward(
        jnp.asarray(b["pos_err"]), jnp.asarray(b["quats"]),
        jnp.asarray(b["angvel"]), jnp.asarray(b["crashes"]))
    np.testing.assert_allclose(np.asarray(our_reward), ref_reward.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(our_crashes), ref_crashes.numpy())


def test_morphy_reward_matches_reference(ref_variant_modules):
    from aerial_gym_simulator_tpu.tasks import position_setpoint_variants as V
    b = _variant_batch(81)
    rng = np.random.default_rng(82)
    joint_vels = rng.normal(0, 0.3, (512, 8)).astype(np.float32)
    t = lambda x: torch.from_numpy(np.array(x))
    ref_reward, ref_crashes = ref_variant_modules["morphy"].compute_reward(
        t(b["pos_err"]), t(b["quats"]), t(b["linvel"]), t(b["angvel"]),
        t(joint_vels), t(b["crashes"]), 1.0, t(b["act"]), t(b["pact"]), {})
    our_reward, our_crashes = V._morphy_reward(
        jnp.asarray(b["pos_err"]), jnp.asarray(b["quats"]),
        jnp.asarray(b["angvel"]), jnp.asarray(joint_vels),
        jnp.asarray(b["crashes"]), jnp.asarray(b["act"]),
        jnp.asarray(b["pact"]))
    np.testing.assert_allclose(np.asarray(our_reward), ref_reward.numpy(),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(our_crashes), ref_crashes.numpy())
