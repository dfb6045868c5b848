"""Floating-base articulated dynamics (CRBA + RNEA) in pure JAX.

Replaces the PhysX articulation the reference uses for reconfigurable robots
(snakey/morphy): configuration-dependent inertia, joint reaction wrenches on
the base, and motor moment arms that move with the links all fall out of the
full joint-space equations of motion

    H(q) [a0; qdd] = tau_gen - C(q, v) - G(q) + J^T f_ext

solved per environment:

  * H via the Composite Rigid Body Algorithm,
  * bias C + G (+ external-force projection) via the Recursive Newton-Euler
    Algorithm with zero accelerations,
  * one batched (6+K)x(6+K) linear solve.

Per-motor thrusts are applied as external spatial forces on their owning
bodies — exactly the reference's per-motor-link LOCAL_SPACE application
(control_allocation.py:103-115, IGE_env_manager.py:444-448) — with the
thrust-to-torque drag couple. Joint drives (position/velocity/effort PD and
the Morphy nonlinear spring) enter as generalized torques; the drive damping
is integrated implicitly (added to the H diagonal scaled by dt), matching
the stability of PhysX's implicit TGS joint drives.

Spatial-vector conventions follow Featherstone ("Rigid Body Dynamics
Algorithms"): motion [omega; v], force [n; f], body coordinates; the base
block uses the base-origin body frame, so the solved base acceleration is
the plain coordinate derivative of (omega_b, v_b).

All loops over bodies are unrolled at trace time (<= ~15 bodies); every
array op is batched over envs, so the whole solver fuses into the same
jitted env_step program as the rest of the physics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.math import quat_integrate, quat_to_rotation_matrix, safe_norm
from .structs import ArtParams, DofParams, SimParams, SimState


def _skew(v):
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], -1),
        jnp.stack([z, o, -x], -1),
        jnp.stack([-y, x, o], -1),
    ], -2)


def _rot_axis(axis, q):
    """Rodrigues rotation about a fixed axis (3,) by per-env angles (N,)."""
    K = _skew(axis)                                   # (3,3)
    s = jnp.sin(q)[:, None, None]
    c = jnp.cos(q)[:, None, None]
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


def _spatial_inertia(m, c, I_com):
    """(6,6) spatial inertia about the body origin from (mass, com, I_com)."""
    cx = _skew(c)
    top = I_com + m * (cx @ cx.T)
    return jnp.block([[top, m * cx], [m * cx.T, m * jnp.eye(3)]])


def _xform_motion(E, r):
    """(N,6,6) spatial motion transform child<-parent from E (N,3,3), r (3,)."""
    N = E.shape[0]
    z = jnp.zeros((N, 3, 3), E.dtype)
    rx = _skew(r)                                     # (3,3)
    return jnp.concatenate([
        jnp.concatenate([E, z], -1),
        jnp.concatenate([-E @ rx, E], -1),
    ], -2)


def _joint_drive(dp: DofParams, q, qd, q_target, qd_target):
    """(explicit spring torque, implicit damping coeff, velocity reference).

    Same drive laws as the decoupled path (reference
    base_reconfigurable.py:63-77 effort PD, robot_manager.py:441-468 engine
    position/velocity drives, morphy.py:28-53 nonlinear arm response).
    """
    if dp.dof_mode in ("position", "velocity") or dp.arm_response != "morphy":
        spring = dp.stiffness * (q_target - q)
        vel_ref = (jnp.zeros_like(qd) if dp.dof_mode == "position"
                   else qd_target)
        damp = dp.damping * jnp.ones_like(q)
    else:
        # Morphy passive arm (morphy.py:33-45): the commanded effort includes
        # the gravity feed-forward -m g l cos(q); actual arm gravity is now
        # modeled by the articulated solver, the command stays as reference.
        e = q - 7.2 * jnp.pi / 180.0
        A = 0.01625 * (0.07 * 0.07)
        spring = A * dp.nonlinear_stiffness * jnp.sign(e) * e * e \
            - 9.81 * 0.01625 * 0.07 * jnp.cos(q)
        vel_ref = jnp.zeros_like(qd)
        damp = -A * dp.linear_damping * jnp.ones_like(q)
    spring = jnp.clip(spring, -dp.max_effort, dp.max_effort)
    return spring, damp, vel_ref


def articulated_substep(params: SimParams, state: SimState,
                        base_force_b: jax.Array, base_torque_b: jax.Array,
                        thrusts: jax.Array) -> SimState:
    """One coupled base+joints physics substep.

    base_force_b/base_torque_b: non-motor wrench on the base (drag +
    disturbance), base frame about base origin. thrusts: (N, M) per-motor
    scalar thrusts applied on their owning links.
    """
    art, dp, rp, mp = params.art, params.dof, params.robot, params.motor
    dt = params.dt
    nb = art.nb
    N = state.pos.shape[0]
    f32 = state.pos.dtype

    Rb = quat_to_rotation_matrix(state.quat)               # (N,3,3) body->world
    omega_b = jnp.einsum("nij,ni->nj", Rb, state.angvel)   # R^T w
    v_b = jnp.einsum("nij,ni->nj", Rb, state.linvel)
    q, qd = state.dof_pos, state.dof_vel

    g_b = (jnp.zeros((N, 3), f32) if rp.disable_gravity
           else jnp.einsum("nij,i->nj", Rb, params.gravity))  # gravity, base frame

    if rp.fix_base_link:
        omega_b = jnp.zeros_like(omega_b)
        v_b = jnp.zeros_like(v_b)

    # ------------------------------------------------------------------
    # forward pass: kinematics, velocities, zero-qdd (bias) accelerations
    # ------------------------------------------------------------------
    v0 = jnp.concatenate([omega_b, v_b], -1)               # (N,6)
    X, R0, p0 = [], [], []          # per body: xform, orient/pos in base frame
    v, a = [], []                   # spatial velocity / bias acceleration
    for i in range(nb):
        Rj = art.R_tree[i] @ _rot_axis(art.axis[i], q[:, i])   # (N,3,3) child->parent
        E = jnp.swapaxes(Rj, -1, -2)
        Xi = _xform_motion(E, art.t_tree[i])
        pi = art.parent[i]
        R0_p = R0[pi] if pi >= 0 else jnp.broadcast_to(jnp.eye(3, dtype=f32), (N, 3, 3))
        p0_p = p0[pi] if pi >= 0 else jnp.zeros((N, 3), f32)
        v_p = v[pi] if pi >= 0 else v0
        a_p = a[pi] if pi >= 0 else jnp.zeros((N, 6), f32)
        R0_i = R0_p @ Rj
        p0_i = p0_p + jnp.einsum("nij,j->ni", R0_p, art.t_tree[i])
        vJ = jnp.concatenate([art.axis[i] * qd[:, i:i + 1],
                              jnp.zeros((N, 3), f32)], -1)
        v_i = jnp.einsum("nij,nj->ni", Xi, v_p) + vJ
        # c = v x^ S qd   (S = [axis; 0] constant in child coords)
        w_i, vl_i = v_i[:, 0:3], v_i[:, 3:6]
        ax = art.axis[i] * qd[:, i:i + 1]
        c_i = jnp.concatenate([jnp.cross(w_i, ax), jnp.cross(vl_i, ax)], -1)
        a_i = jnp.einsum("nij,nj->ni", Xi, a_p) + c_i
        X.append(Xi); R0.append(R0_i); p0.append(p0_i); v.append(v_i); a.append(a_i)

    # ------------------------------------------------------------------
    # external forces per body (own coords, about own origin): gravity +
    # per-motor thrust & drag couple; base gets drag/disturbance wrench
    # ------------------------------------------------------------------
    cq = mp.thrust_to_torque_ratio
    f_ext = [jnp.zeros((N, 6), f32) for _ in range(nb)]
    f_ext_base = jnp.concatenate([base_torque_b, base_force_b], -1)
    if not rp.disable_gravity:
        mg_base = art.base_mass * g_b
        f_ext_base = f_ext_base + jnp.concatenate(
            [jnp.cross(jnp.broadcast_to(art.base_com, (N, 3)), mg_base), mg_base], -1)
        for i in range(nb):
            gi = jnp.einsum("nji,nj->ni", R0[i], g_b)      # R0^T g
            mgi = art.mass[i] * gi
            f_ext[i] = f_ext[i] + jnp.concatenate(
                [jnp.cross(jnp.broadcast_to(art.com[i], (N, 3)), mgi), mgi], -1)
    for m, body in enumerate(art.motor_body):
        fm = art.motor_dir[m] * thrusts[:, m:m + 1]        # (N,3)
        nm = (jnp.cross(jnp.broadcast_to(art.motor_pos[m], (N, 3)), fm)
              - cq * mp.motor_directions[m] * thrusts[:, m:m + 1]
              * art.motor_dir[m])
        fs = jnp.concatenate([nm, fm], -1)
        if body < 0:
            f_ext_base = f_ext_base + fs
        else:
            f_ext[body] = f_ext[body] + fs

    # ------------------------------------------------------------------
    # RNEA backward pass: bias generalized forces (qdd = 0, a0 = 0)
    # ------------------------------------------------------------------
    I_base = _spatial_inertia(art.base_mass, art.base_com, art.base_inertia)
    I_body = [_spatial_inertia(art.mass[i], art.com[i], art.inertia[i])
              for i in range(nb)]

    def _crf_apply(vv, ff):
        """(v x*) f for spatial v, f: [w x n + vl x fl ; w x fl]."""
        w, vl = vv[:, 0:3], vv[:, 3:6]
        n, fl = ff[:, 0:3], ff[:, 3:6]
        return jnp.concatenate([jnp.cross(w, n) + jnp.cross(vl, fl),
                                jnp.cross(w, fl)], -1)

    fb = [jnp.einsum("ij,nj->ni", I_body[i], a[i])
          + _crf_apply(v[i], jnp.einsum("ij,nj->ni", I_body[i], v[i]))
          - f_ext[i]
          for i in range(nb)]
    fb_base = _crf_apply(v0, jnp.einsum("ij,nj->ni", I_base, v0)) - f_ext_base

    p_q = [None] * nb
    for i in range(nb - 1, -1, -1):
        p_q[i] = jnp.einsum("j,nj->n", jnp.concatenate(
            [art.axis[i], jnp.zeros(3, f32)]), fb[i])
        up = jnp.einsum("nji,nj->ni", X[i], fb[i])         # X^T f
        if art.parent[i] >= 0:
            fb[art.parent[i]] = fb[art.parent[i]] + up
        else:
            fb_base = fb_base + up

    # ------------------------------------------------------------------
    # mass matrix H (N, 6+K, 6+K) via base-frame body Jacobians:
    #   H = sum_i m_i Wv_i^T Wv_i + Ww_i^T I_ci Ww_i
    # where Ww/Wv map u = [w_b; v_b; qd] (base coords) to body angular /
    # com-linear velocity. Scatter-free: columns assemble with trace-time
    # stacks, bodies fold into two einsums — the CRBA-walk version built
    # the same matrix with ~K^2 dynamic-update-slices, which dominated the
    # snakey6 profile. This formulation is the one the autodiff
    # kinetic-energy Hessian oracle checks directly
    # (tests/test_articulated.py).
    # ------------------------------------------------------------------
    K = nb
    D = 6 + K
    zcol = jnp.zeros((N, 3), f32)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=f32), (N, 3, 3))
    z33 = jnp.zeros((N, 3, 3), f32)

    # static ancestor chains
    ancestors = []
    for i in range(nb):
        chain, j = [], i
        while j >= 0:
            chain.append(j)
            j = art.parent[j]
        ancestors.append(set(chain))

    def _skew_batch(v):
        return _skew(v)

    # base-frame joint axes and COM positions
    axis_b = [jnp.einsum("nij,j->ni", R0[i], art.axis[i]) for i in range(nb)]
    com_b = [p0[i] + jnp.einsum("nij,j->ni", R0[i], art.com[i])
             for i in range(nb)]

    Wv_list, Ww_list, Ibar_list, m_list = [], [], [], []
    # base body
    c_b = jnp.broadcast_to(art.base_com, (N, 3))
    Wv_list.append(jnp.concatenate(
        [-_skew_batch(c_b), eye3] + [zcol[:, :, None]] * K, -1))
    Ww_list.append(jnp.concatenate(
        [eye3, z33] + [zcol[:, :, None]] * K, -1))
    Ibar_list.append(jnp.broadcast_to(art.base_inertia, (N, 3, 3)))
    m_list.append(art.base_mass)
    for i in range(nb):
        cols_v = [-_skew_batch(com_b[i]), eye3]
        cols_w = [eye3, z33]
        for k in range(nb):
            if k in ancestors[i]:
                cols_v.append(jnp.cross(axis_b[k],
                                        com_b[i] - p0[k])[:, :, None])
                cols_w.append(axis_b[k][:, :, None])
            else:
                cols_v.append(zcol[:, :, None])
                cols_w.append(zcol[:, :, None])
        Wv_list.append(jnp.concatenate(cols_v, -1))
        Ww_list.append(jnp.concatenate(cols_w, -1))
        Ibar_list.append(jnp.einsum("nij,jk,nlk->nil", R0[i],
                                    art.inertia[i], R0[i]))
        m_list.append(art.mass[i])

    Wv = jnp.stack(Wv_list)                               # (B, N, 3, D)
    Ww = jnp.stack(Ww_list)
    Ibar = jnp.stack(Ibar_list)                           # (B, N, 3, 3)
    m_arr = jnp.stack([jnp.asarray(m, f32) for m in m_list])  # (B,)
    H = (jnp.einsum("b,bnxd,bnxe->nde", m_arr, Wv, Wv)
         + jnp.einsum("bnxd,bnxy,bnye->nde", Ww, Ibar, Ww))
    arm_diag = jnp.concatenate([jnp.zeros(6, f32),
                                jnp.full((K,), art.armature, f32)])
    H = H + jnp.diag(arm_diag)

    # ------------------------------------------------------------------
    # joint drives (implicit damping) + SPD Cholesky solve
    # ------------------------------------------------------------------
    spring, damp, vel_ref = _joint_drive(dp, q, qd, state.dof_pos_target,
                                         state.dof_vel_target)
    tau = spring + damp * (vel_ref - qd)
    rhs = jnp.concatenate([-fb_base, tau - jnp.stack(p_q, -1)], -1)
    H = H + jnp.concatenate(
        [jnp.zeros((N, 6), f32), dt * damp], -1)[:, :, None] * jnp.eye(6 + K)

    def _spd_solve(A, b):
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
        return jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1)[..., 0]

    if rp.fix_base_link:
        qdd = _spd_solve(H[:, 6:, 6:], rhs[:, 6:])
        acc = jnp.concatenate([jnp.zeros((N, 6), f32), qdd], -1)
    else:
        acc = _spd_solve(H, rhs)

    # ------------------------------------------------------------------
    # semi-implicit integration + engine damping/clamps + joint limits
    # ------------------------------------------------------------------
    omega_n = omega_b + dt * acc[:, 0:3]
    v_n = v_b + dt * acc[:, 3:6]
    omega_n = omega_n * jnp.maximum(0.0, 1.0 - rp.angular_damping * dt)
    v_n = v_n * jnp.maximum(0.0, 1.0 - rp.linear_damping * dt)
    wmag = safe_norm(omega_n, axis=-1, keepdims=True)
    omega_n = jnp.where(wmag > rp.max_angular_velocity,
                        omega_n * (rp.max_angular_velocity
                                   / jnp.maximum(wmag, 1e-9)), omega_n)
    vmag = safe_norm(v_n, axis=-1, keepdims=True)
    v_n = jnp.where(vmag > rp.max_linear_velocity,
                    v_n * (rp.max_linear_velocity
                           / jnp.maximum(vmag, 1e-9)), v_n)

    qd_n = jnp.clip(qd + dt * acc[:, 6:], -dp.max_velocity, dp.max_velocity)
    q_n = q + dt * qd_n
    # inelastic joint stops (no float-equality test: compare bounds directly)
    hit_lo = q_n < dp.lower_limit
    hit_hi = q_n > dp.upper_limit
    qd_n = jnp.where(hit_lo & (qd_n < 0.0), 0.0, qd_n)
    qd_n = jnp.where(hit_hi & (qd_n > 0.0), 0.0, qd_n)
    q_n = jnp.clip(q_n, dp.lower_limit, dp.upper_limit)

    if rp.fix_base_link:
        new_pos, new_quat = state.pos, state.quat
        new_linvel = jnp.zeros_like(state.linvel)
        new_angvel = jnp.zeros_like(state.angvel)
    else:
        # rotate the updated BODY-frame velocities into world with the
        # POST-integration attitude: using the stale R would drop the dt*w x v
        # transport term — an O(dt) per-step error that showed up as a
        # dt-independent momentum leak (caught by
        # tests/test_articulated.py::test_free_floating_momentum_conservation)
        new_quat = quat_integrate(state.quat,
                                  jnp.einsum("nij,nj->ni", Rb, omega_n), dt)
        Rn = quat_to_rotation_matrix(new_quat)
        new_angvel = jnp.einsum("nij,nj->ni", Rn, omega_n)
        new_linvel = jnp.einsum("nij,nj->ni", Rn, v_n)
        new_pos = state.pos + dt * new_linvel

    # IMU source: total-mass specific force of the base origin in base frame
    # (material accel minus gravity); keeps sensors/imu.py semantics equal to
    # the single-body path (applied_force / mass = specific force).
    spec = acc[:, 3:6] + jnp.cross(omega_b, v_b) - g_b
    applied_force_b = rp.mass * spec

    return state.replace(pos=new_pos, quat=new_quat, linvel=new_linvel,
                         angvel=new_angvel, dof_pos=q_n, dof_vel=qd_n,
                         applied_force_b=applied_force_b)
