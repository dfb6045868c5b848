"""The jitted simulation core: substep physics, env step, masked reset.

This one module replaces the reference's entire per-step object web
(EnvManager.step -> RobotManager.pre_physics_step -> BaseMultirotor.step ->
controller -> ControlAllocator -> MotorModel -> IsaacGymEnv.physics_step ->
PhysX; env_manager.py:399-432 and base_multirotor.py:296-307) with one pure
function: everything — controller, allocation, motor lag, drag, disturbance,
6-DoF integration, contact proxy, collision accumulation — is traced once and
compiled by XLA into a single fused TPU program. There is no engine
read/write round-trip: the framework owns the state (SURVEY.md section 3.3
note on the reset asymmetry disappearing).

Frames:
  * root state is world-frame (pos, xyzw quat, linvel, angvel) exactly like
    Isaac Gym's root-state tensor,
  * applied forces/torques are body-frame (reference applies LOCAL_SPACE
    force tensors, IGE_env_manager.py:444-448),
  * per-motor thrusts are mapped to a net body wrench through the allocation
    matrix — physically identical to per-link force application on a rigid
    body (the allocation rows ARE the moment arms).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..control.controllers import (
    Gains,
    compute_robot_obs,
    controller_update,
)
from ..ops.motor_model import motor_step
from ..utils import rng as rnglib
from ..utils.math import (
    interpolate_ratio,
    safe_norm,
    quat_from_euler_xyz_tensor,
    quat_integrate,
    quat_rotate,
    quat_rotate_inverse,
    tensor_clamp,
)
from .structs import SimParams, SimState


# ---------------------------------------------------------------------------
# wrench computation (controller + allocation + motor model + drag + dist.)
# ---------------------------------------------------------------------------


def compute_robot_wrench(params: SimParams, state: SimState, action: jax.Array,
                         dist_key: jax.Array, include_motor_wrench: bool = True):
    """One control substep -> (force_body, torque_body, new_motor_thrust).

    Mirrors BaseMultirotor.step: update derived states, clip actions, run
    controller, allocate to motors (with first-order lag), add aerodynamic
    drag and the Bernoulli-sampled disturbance wrench.

    include_motor_wrench=False (articulated robots): the returned wrench is
    drag + disturbance only — per-motor thrusts are applied at their true
    joint-dependent link positions inside the articulated solver, matching
    the reference's per-motor-link force application instead of a static
    allocation to the base.
    """
    rp, mp, cp = params.robot, params.motor, params.controller
    obs = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    action = jnp.clip(action, -10.0, 10.0)  # reference clip_actions

    if cp.name == "no_control":
        # actions are per-motor thrust references directly
        ref_thrust = action
    else:
        gains = Gains(state.K_pos, state.K_vel, state.K_rot, state.K_angvel)
        wrench_cmd = controller_update(cp.name, cp, rp, params.gravity, obs,
                                       gains, action)
        ref_thrust = jnp.einsum("mk,nk->nm", mp.allocation_pinv, wrench_cmd)

    new_thrust = motor_step(
        mp, params.dt, ref_thrust, state.motor_thrust,
        state.motor_tau_inc, state.motor_tau_dec, state.motor_thrust_constant,
    )

    if include_motor_wrench:
        # net wrench of per-motor-link forces == allocation @ thrusts (the
        # allocation rows ARE the moment arms); identical math for the
        # reference's root_link wrench re-assembly path
        # (ControlAllocator.update_wrench)
        wrench = jnp.einsum("km,nm->nk", mp.allocation_matrix, new_thrust)
        force_b = wrench[..., 0:3]
        torque_b = wrench[..., 3:6]
    else:
        force_b = jnp.zeros_like(state.pos)
        torque_b = jnp.zeros_like(state.pos)

    # aerodynamic drag (reference simulate_drag, body frame)
    v_b = obs.body_linvel
    w_b = obs.body_angvel
    drag_f = (-rp.drag_lin_linear * v_b
              - rp.drag_lin_quadratic * safe_norm(v_b, axis=-1, keepdims=True) * v_b)
    drag_t = (-rp.drag_ang_linear * w_b
              - rp.drag_ang_quadratic * jnp.abs(w_b) * w_b)
    force_b = force_b + drag_f
    torque_b = torque_b + drag_t

    # random wrench disturbance (reference apply_disturbance)
    if rp.enable_disturbance:
        k_occ = jax.vmap(jax.random.fold_in)(dist_key, jnp.full((dist_key.shape[0],), 0, jnp.uint32))
        k_f = jax.vmap(jax.random.fold_in)(dist_key, jnp.full((dist_key.shape[0],), 1, jnp.uint32))
        k_t = jax.vmap(jax.random.fold_in)(dist_key, jnp.full((dist_key.shape[0],), 2, jnp.uint32))
        occur = rnglib.env_bernoulli(k_occ, rp.disturbance_prob)[..., None]
        f_dist = rnglib.env_uniform(k_f, -rp.max_force_disturbance,
                                    rp.max_force_disturbance, (3,))
        t_dist = rnglib.env_uniform(k_t, -rp.max_torque_disturbance,
                                    rp.max_torque_disturbance, (3,))
        force_b = force_b + f_dist * occur
        torque_b = torque_b + t_dist * occur

    return force_b, torque_b, new_thrust


# ---------------------------------------------------------------------------
# 6-DoF rigid-body integration (replaces PhysX, reference section 2.2 item 1)
# ---------------------------------------------------------------------------


def integrate_rigid_body(params: SimParams, state: SimState,
                         force_b: jax.Array, torque_b: jax.Array) -> SimState:
    """Semi-implicit (symplectic) Euler step of the free rigid body.

    v+ = damp * (v + dt*(R f_b / m + g));  x+ = x + dt v+
    w+ = damp * (w + dt * I^-1 (tau - w x I w));  q+ = exp(dt w+) q
    Per-body engine damping follows PhysX: v *= max(0, 1 - c*dt).
    """
    rp = params.robot
    dt = params.dt

    if rp.fix_base_link:
        # Clamped root (reference AssetOptions.fix_base_link, used by
        # morphy_fixed_base for arm sys-id): pose frozen, velocities zero.
        return state.replace(linvel=jnp.zeros_like(state.linvel),
                             angvel=jnp.zeros_like(state.angvel))

    force_w = quat_rotate(state.quat, force_b)
    accel = force_w / rp.mass
    if not rp.disable_gravity:  # asset disable_gravity flag (reference cfg)
        accel = accel + params.gravity
    linvel = state.linvel + dt * accel
    linvel = linvel * jnp.maximum(0.0, 1.0 - rp.linear_damping * dt)
    speed = safe_norm(linvel, axis=-1, keepdims=True)
    linvel = jnp.where(speed > rp.max_linear_velocity,
                       linvel * (rp.max_linear_velocity / jnp.maximum(speed, 1e-9)),
                       linvel)
    pos = state.pos + dt * linvel

    w_b = quat_rotate_inverse(state.quat, state.angvel)
    Iw = jnp.einsum("ij,nj->ni", rp.inertia, w_b)
    w_dot = jnp.einsum("ij,nj->ni", rp.inv_inertia, torque_b - jnp.cross(w_b, Iw))
    w_b = w_b + dt * w_dot
    w_b = w_b * jnp.maximum(0.0, 1.0 - rp.angular_damping * dt)
    w_mag = safe_norm(w_b, axis=-1, keepdims=True)
    w_b = jnp.where(w_mag > rp.max_angular_velocity,
                    w_b * (rp.max_angular_velocity / jnp.maximum(w_mag, 1e-9)),
                    w_b)
    angvel = quat_rotate(state.quat, w_b)
    quat = quat_integrate(state.quat, angvel, dt)

    return state.replace(pos=pos, quat=quat, linvel=linvel, angvel=angvel)


# ---------------------------------------------------------------------------
# DOF joint dynamics (reconfigurable robots; replaces PhysX articulation DOFs)
# ---------------------------------------------------------------------------


def integrate_dofs(params: SimParams, state: SimState) -> SimState:
    """One substep of decoupled joint dynamics J*qdd = tau.

    tau by drive mode (reference robot_manager.py:441-468 drive-mode setup +
    base_reconfigurable.call_arm_controller):
      position:  tau = Kp*(q_target - q) - Kd*qd            (engine PD drive)
      velocity:  tau = Kd*(qd_target - qd)                  (engine vel drive)
      effort+pd: tau = Kp*(q_target - q) + Kd*(qd_target - qd)
      effort+morphy: nonlinear spring-damper + gravity torque on the arm
                     (morphy.py:28-53 constants)
    """
    dp = params.dof
    q, qd = state.dof_pos, state.dof_vel
    # Decompose torque as  tau = spring(q) + damp * (vel_ref - qd)  and
    # integrate the damping term IMPLICITLY (PhysX drives are solved
    # implicitly inside the TGS solver; explicit damping would be unstable
    # whenever dt*Kd/J > 2, which holds for the reference's gain sets).
    if dp.dof_mode in ("position", "velocity") or dp.arm_response != "morphy":
        # engine PD drive / robot-level PD effort (same math; velocity mode
        # has Kp=0 in the reference configs, position mode has vel_ref=0)
        spring = dp.stiffness * (state.dof_pos_target - q)
        vel_ref = (jnp.zeros_like(qd) if dp.dof_mode == "position"
                   else state.dof_vel_target)
        damp = dp.damping
    else:
        # Morphy arm: mass 0.01625 kg at 0.07 m, rest angle 7.2 deg
        # (morphy.py:33-45); linear_damping is negative => damping torque
        e = q - 7.2 * jnp.pi / 180.0
        A = 0.01625 * (0.07 * 0.07)
        spring = A * dp.nonlinear_stiffness * jnp.sign(e) * e * e \
            - 9.81 * 0.01625 * 0.07 * jnp.cos(q)
        vel_ref = jnp.zeros_like(qd)
        damp = -A * dp.linear_damping

    spring = jnp.clip(spring, -dp.max_effort, dp.max_effort)
    dt = params.dt
    J = dp.dof_inertia
    qd = (qd + dt * (spring + damp * vel_ref) / J) / (1.0 + dt * damp / J)
    qd = jnp.clip(qd, -dp.max_velocity, dp.max_velocity)
    q = q + dt * qd
    # inelastic joint stops (direct bound tests, no float-equality probe)
    hit_lo = q < dp.lower_limit
    hit_hi = q > dp.upper_limit
    qd = jnp.where(hit_lo & (qd < 0.0), 0.0, qd)
    qd = jnp.where(hit_hi & (qd > 0.0), 0.0, qd)
    q_clamped = jnp.clip(q, dp.lower_limit, dp.upper_limit)
    return state.replace(dof_pos=q_clamped, dof_vel=qd)


# ---------------------------------------------------------------------------
# contact proxy (replaces PhysX contact solver for crash detection)
# ---------------------------------------------------------------------------


def contact_force_magnitude(params: SimParams, state: SimState) -> jax.Array:
    """Penetration-depth force proxy against ground plane and obstacles.

    The reference only consumes net contact force MAGNITUDE vs a threshold
    (env_manager.py:358-362: collision = |contact force| > threshold), so a
    stiff penalty-force proxy reproduces the observable behavior without a
    general contact solver.
    """
    N = state.pos.shape[0]
    total = jnp.zeros((N,), dtype=jnp.float32)
    stiffness = 1000.0  # N/m: deep enough penetration always crosses threshold
    r = params.robot.collision_radius

    if params.env.create_ground_plane:
        depth = jnp.maximum(0.0, r - state.pos[..., 2])
        total = total + stiffness * depth

    if params.scene is not None and params.scene.num_assets > 0:
        from ..envs.collision import obstacle_contact_forces  # lazy, avoids cycle
        total = total + obstacle_contact_forces(params, state)

    return total


# ---------------------------------------------------------------------------
# env step
# ---------------------------------------------------------------------------


def _substep(params: SimParams, state: SimState, action: jax.Array,
             sub_idx) -> SimState:
    rng, sub = rnglib.split_env_keys(state.rng)
    dist_key = jax.vmap(jax.random.fold_in)(
        sub, jnp.full((sub.shape[0],), sub_idx, dtype=jnp.uint32))
    force_b, torque_b, new_thrust = compute_robot_wrench(
        params, state, action, dist_key,
        include_motor_wrench=params.art is None)
    state = state.replace(rng=rng, motor_thrust=new_thrust,
                          applied_force_b=force_b, applied_torque_b=torque_b)
    if params.art is not None:
        # fully-coupled floating-base articulation (reconfigurable robots):
        # motors push on their own links, joints react on the base
        from .articulated import articulated_substep
        state = articulated_substep(params, state, force_b, torque_b,
                                    new_thrust)
    else:
        state = integrate_rigid_body(params, state, force_b, torque_b)
        if params.dof is not None and params.dof.num_dofs > 0:
            state = integrate_dofs(params, state)
    if params.scene is not None and params.scene.num_assets > 0:
        from ..envs.scene import integrate_obstacles
        state = integrate_obstacles(params, state)
    # collision accumulation (reference compute_observations)
    contact = contact_force_magnitude(params, state)
    collided = (contact > params.env.collision_force_threshold).astype(jnp.float32)
    return state.replace(collisions=state.collisions + collided)


def env_step(params: SimParams, state: SimState, action: jax.Array,
             n_substeps: Optional[jax.Array] = None) -> SimState:
    """One environment step = n physics substeps (control-rate decimation).

    When the config's substep std is 0 the loop is a static Python range and
    XLA fuses/unrolls it; otherwise `n_substeps` is a traced scalar (sampled
    by the caller, reference env_manager.py:417-425) and we run a bounded
    fori_loop.
    """
    state = state.replace(
        collisions=jnp.zeros_like(state.collisions),
        crashes=jnp.zeros_like(state.crashes),
        truncations=jnp.zeros_like(state.truncations),
    )
    env = params.env
    if env.substep_std == 0.0 or n_substeps is None:
        if env.substep_mean <= 2:
            # tiny loops: unroll so XLA fuses across substeps
            for i in range(env.substep_mean):
                state = _substep(params, state, action, i)
        else:
            # larger decimation (e.g. 10 substeps in the obstacle envs):
            # trace the body ONCE — unrolling would multiply the program
            # (and compile time) by the substep count for negligible gain
            def body(i, st):
                return _substep(params, st, action, i)
            state = jax.lax.fori_loop(0, env.substep_mean, body, state,
                                      unroll=False)
    else:
        def body(i, st):
            return _substep(params, st, action, i)
        state = jax.lax.fori_loop(0, n_substeps, body, state)
    state = state.replace(sim_steps=state.sim_steps + 1)
    # "crashes" is the collision accumulator exposed to tasks (reference
    # global_tensor_dict["crashes"] IS the collision tensor, env_manager.py:167)
    state = state.replace(
        crashes=jnp.maximum(state.crashes,
                            (state.collisions > 0).astype(jnp.float32)))
    return state


# ---------------------------------------------------------------------------
# masked reset (replaces reset_idx index lists, reference env_manager.py:273-301)
# ---------------------------------------------------------------------------


def sample_reset_states(params: SimParams, state: SimState):
    """Draw full fresh per-env state (bounds, pose, vel, gains, motors)."""
    rp, mp, cp = params.robot, params.motor, params.controller
    rng = state.rng
    keys = []
    for _ in range(8):
        rng, sub = rnglib.split_env_keys(rng)
        keys.append(sub)
    (k_bounds, k_state, k_gains, k_tau_i, k_tau_d, k_thrust, k_kt, k_extra) = keys

    N = state.pos.shape[0]
    kb_lo = jax.vmap(jax.random.fold_in)(k_bounds, jnp.zeros((N,), jnp.uint32))
    kb_hi = jax.vmap(jax.random.fold_in)(k_bounds, jnp.ones((N,), jnp.uint32))
    bounds_lo = rnglib.env_uniform(kb_lo, params.env.lower_bound_min,
                                   params.env.lower_bound_max, (3,))
    bounds_hi = rnglib.env_uniform(kb_hi, params.env.upper_bound_min,
                                   params.env.upper_bound_max, (3,))

    # [ratio_xyz, rpy, 1, v, w] (reference base_multirotor.reset_idx)
    rand13 = rnglib.env_uniform(k_state, rp.min_init_state, rp.max_init_state, (13,))
    pos = interpolate_ratio(bounds_lo, bounds_hi, rand13[..., 0:3])
    quat = quat_from_euler_xyz_tensor(rand13[..., 3:6])
    linvel = rand13[..., 7:10]
    angvel = rand13[..., 10:13]

    # controller gain randomization
    if cp.randomize_params:
        kg = [jax.vmap(jax.random.fold_in)(k_gains, jnp.full((N,), i, jnp.uint32))
              for i in range(4)]
        K_pos = rnglib.env_uniform(kg[0], cp.K_pos_min, cp.K_pos_max, (3,))
        K_vel = rnglib.env_uniform(kg[1], cp.K_vel_min, cp.K_vel_max, (3,))
        K_rot = rnglib.env_uniform(kg[2], cp.K_rot_min, cp.K_rot_max, (3,))
        K_angvel = rnglib.env_uniform(kg[3], cp.K_angvel_min, cp.K_angvel_max, (3,))
    else:
        mid = lambda lo, hi: jnp.broadcast_to((lo + hi) / 2.0, (N, 3))
        K_pos = mid(cp.K_pos_min, cp.K_pos_max)
        K_vel = mid(cp.K_vel_min, cp.K_vel_max)
        K_rot = mid(cp.K_rot_min, cp.K_rot_max)
        K_angvel = mid(cp.K_angvel_min, cp.K_angvel_max)

    M = mp.num_motors
    tau_inc = rnglib.env_uniform(k_tau_i, mp.tau_inc_min, mp.tau_inc_max, (M,))
    tau_dec = rnglib.env_uniform(k_tau_d, mp.tau_dec_min, mp.tau_dec_max, (M,))
    thrust = rnglib.env_uniform(k_thrust, mp.min_thrust, mp.max_thrust, (M,))
    kt = rnglib.env_uniform(k_kt, mp.thrust_constant_min, mp.thrust_constant_max, (M,))

    fresh = dict(
        pos=pos, quat=quat, linvel=linvel, angvel=angvel,
        motor_thrust=thrust, motor_tau_inc=tau_inc, motor_tau_dec=tau_dec,
        motor_thrust_constant=kt,
        K_pos=K_pos, K_vel=K_vel, K_rot=K_rot, K_angvel=K_angvel,
        bounds_lo=bounds_lo, bounds_hi=bounds_hi,
    )

    # joint init sampling (reference base_reconfigurable.reset_idx:55-60)
    if params.dof is not None and params.dof.num_dofs > 0:
        dp = params.dof
        kq = jax.vmap(jax.random.fold_in)(k_extra, jnp.full((N,), 20, jnp.uint32))
        kqd = jax.vmap(jax.random.fold_in)(k_extra, jnp.full((N,), 21, jnp.uint32))
        D = dp.num_dofs
        fresh["dof_pos"] = rnglib.env_uniform(kq, dp.init_pos_min,
                                              dp.init_pos_max, (D,))
        fresh["dof_vel"] = rnglib.env_uniform(kqd, dp.init_vel_min,
                                              dp.init_vel_max, (D,))
        fresh["dof_pos_target"] = jnp.zeros((N, D), jnp.float32)
        fresh["dof_vel_target"] = jnp.zeros((N, D), jnp.float32)
    return fresh, rng, k_extra


def reset_envs(params: SimParams, state: SimState, mask: jax.Array) -> SimState:
    """Masked auto-reset: where mask, replace state with freshly sampled one."""
    fresh, rng, k_extra = sample_reset_states(params, state)

    def sel(new, old):
        m = mask.reshape((-1,) + (1,) * (old.ndim - 1)).astype(bool)
        return jnp.where(m, new, old)

    updates = {name: sel(val, getattr(state, name)) for name, val in fresh.items()}
    state = state.replace(
        rng=rng,
        sim_steps=jnp.where(mask.astype(bool), 0, state.sim_steps),
        collisions=jnp.where(mask.astype(bool), 0.0, state.collisions),
        **updates,
    )
    if params.scene is not None and params.scene.num_assets > 0:
        from ..envs.scene import reset_obstacles  # lazy import avoids cycle
        state = reset_obstacles(params, state, mask, k_extra)

    # sensor mount re-randomization + IMU bias reset (reference
    # env_manager.reset_idx -> sensor reset, warp_sensor.py:129-171)
    mb = mask.astype(bool)
    N = mask.shape[0]
    # mask broadcast matches either mount rank: (N, 3) single-sensor or
    # (N, S, 3) when num_sensors > 1
    _mmask = lambda x: mb.reshape((N,) + (1,) * (x.ndim - 1))
    if params.camera is not None:
        from ..sensors.raycast_sensor import sample_mount_pose
        kc = jax.vmap(jax.random.fold_in)(k_extra, jnp.full((N,), 10, jnp.uint32))
        mpos, mquat = sample_mount_pose(params.camera, kc)
        state = state.replace(
            cam_mount_pos=jnp.where(_mmask(mpos), mpos, state.cam_mount_pos),
            cam_mount_quat=jnp.where(_mmask(mquat), mquat,
                                     state.cam_mount_quat))
    if params.lidar is not None:
        from ..sensors.raycast_sensor import sample_mount_pose
        kl = jax.vmap(jax.random.fold_in)(k_extra, jnp.full((N,), 11, jnp.uint32))
        mpos, mquat = sample_mount_pose(params.lidar, kl)
        state = state.replace(
            lidar_mount_pos=jnp.where(_mmask(mpos), mpos,
                                      state.lidar_mount_pos),
            lidar_mount_quat=jnp.where(_mmask(mquat), mquat,
                                       state.lidar_mount_quat))
    if params.imu is not None:
        from ..sensors.imu import sample_imu_reset
        ki = jax.vmap(jax.random.fold_in)(k_extra, jnp.full((N,), 12, jnp.uint32))
        ab, gb, mq = sample_imu_reset(params.imu, ki)
        state = state.replace(
            imu_accel_bias=jnp.where(mb[:, None], ab, state.imu_accel_bias),
            imu_gyro_bias=jnp.where(mb[:, None], gb, state.imu_gyro_bias),
            imu_mount_quat=jnp.where(mb[:, None], mq, state.imu_mount_quat))
    return state


def post_reward_step(params: SimParams, state: SimState) -> SimState:
    """Auto-reset terminated/truncated envs (reference
    post_reward_calculation_step -> reset_terminated_and_truncated_envs)."""
    if params.env.reset_on_collision:
        done = jnp.maximum(state.crashes, state.truncations)
    else:
        done = state.truncations
    return reset_envs(params, state, done)
