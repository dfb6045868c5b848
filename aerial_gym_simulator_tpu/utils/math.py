"""Batched quaternion / SO(3) math for the TPU-native aerial gym.

Pure-JAX replacement for the reference's torch.jit.script math library
(reference: aerial_gym/utils/math.py) and the pytorch3d quaternion ops used by
its controllers (matrix_to_quaternion at base_lee_controller.py:188).

Conventions (kept identical to the reference for API parity):
  * quaternions are ``[x, y, z, w]`` (scalar last),
  * euler angles are intrinsic XYZ (roll, pitch, yaw),
  * all functions broadcast over arbitrary leading batch dims.

Everything here is traceable/jittable and differentiable; nothing allocates
per-call Python state, so XLA fuses these into the surrounding step kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# generic helpers
# ---------------------------------------------------------------------------


def safe_sqrt(x: jax.Array) -> jax.Array:
    """sqrt(max(x, 0)) with a finite gradient at/below zero.

    jnp.sqrt's reverse-mode derivative is inf at 0, and a NaN leaks through
    even the UNSELECTED branch of a jnp.where (inf * 0 cotangent) — which
    made whole-rollout gradients (differentiable sys-id/control through
    env_step) NaN. Forward-identical to sqrt(max(x, 0)); gradient is 0 for
    x <= 0 (the true subgradient of the clamped forward).
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = False) -> jax.Array:
    """L2 norm with a finite (zero) gradient at x = 0.

    jnp.linalg.norm's derivative x/||x|| is NaN at the origin; zero vectors
    are routine here (hover angular velocity, zero body velocity at reset).
    Forward-identical to jnp.linalg.norm.
    """
    return safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))


def normalize(x: jax.Array, eps: float = 1e-9) -> jax.Array:
    """Unit-normalize along the last axis (safe for zero vectors)."""
    n = safe_norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def tensor_clamp(t, lo, hi):
    return jnp.minimum(jnp.maximum(t, lo), hi)


def ssa(a: jax.Array) -> jax.Array:
    """Smallest signed angle, wraps to [-pi, pi)."""
    return jnp.mod(a + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def normalize_angle(x: jax.Array) -> jax.Array:
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def scale_transform(x, lower, upper):
    """Map x in [-1, 1] -> [lower, upper]."""
    return 0.5 * (x + 1.0) * (upper - lower) + lower


def unscale_transform(x, lower, upper):
    """Map x in [lower, upper] -> [-1, 1]."""
    return (2.0 * x - upper - lower) / (upper - lower)


def interpolate_ratio(lo, hi, ratio):
    """lo + (hi - lo) * ratio  (the reference's torch_interpolate_ratio)."""
    return lo + (hi - lo) * ratio


def exponential_reward(magnitude, base_width, value):
    return magnitude * jnp.exp(-(value * value) / base_width)


def exponential_penalty(magnitude, base_width, value):
    return magnitude * (jnp.exp(-(value * value) / base_width) - 1.0)


def exp_func(x, gain, exp):
    """gain * exp(-exp * x^2) — reward shaping used by the setpoint tasks."""
    return gain * jnp.exp(-exp * x * x)


def exp_penalty_func(x, gain, exp):
    return gain * (jnp.exp(-exp * x * x) - 1.0)


def compute_vee_map(skew: jax.Array) -> jax.Array:
    """Vee map of a (...,3,3) skew-symmetric matrix -> (...,3)."""
    return jnp.stack(
        [-skew[..., 1, 2], skew[..., 0, 2], -skew[..., 0, 1]], axis=-1
    )


def hat_map(v: jax.Array) -> jax.Array:
    """Hat (skew) map of a (...,3) vector -> (...,3,3)."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def pd_control(pos_error, vel_error, stiffness, damping):
    return stiffness * pos_error + damping * vel_error


# ---------------------------------------------------------------------------
# quaternion algebra  (xyzw, scalar-last)
# ---------------------------------------------------------------------------

# identity xyzw quaternion as a NUMPY array: a device array created at
# import time would initialize the XLA backend before
# jax.distributed.initialize can run (multi-host ordering constraint)
QUAT_IDENTITY = np.array([0.0, 0.0, 0.0, 1.0], dtype=np.float32)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b for xyzw quaternions, broadcasting batch dims."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def quat_inverse(q: jax.Array) -> jax.Array:
    """Inverse for unit quaternions == conjugate (matches reference)."""
    return quat_conjugate(q)


def quat_unit(q: jax.Array) -> jax.Array:
    return normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q (body -> world)."""
    q_w = q[..., 3:4]
    q_vec = q[..., :3]
    a = v * (2.0 * q_w * q_w - 1.0)
    b = jnp.cross(q_vec, v) * (2.0 * q_w)
    c = q_vec * (2.0 * jnp.sum(q_vec * v, axis=-1, keepdims=True))
    return a + b + c


def quat_rotate_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q^{-1} (world -> body)."""
    q_w = q[..., 3:4]
    q_vec = q[..., :3]
    a = v * (2.0 * q_w * q_w - 1.0)
    b = jnp.cross(q_vec, v) * (2.0 * q_w)
    c = q_vec * (2.0 * jnp.sum(q_vec * v, axis=-1, keepdims=True))
    return a - b + c


# aliases kept for reference-API parity
quat_apply = quat_rotate


def quat_apply_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate_inverse(q, v)


def quat_axis(q: jax.Array, axis: int = 0) -> jax.Array:
    """Column `axis` of the rotation matrix of q (a rotated basis vector)."""
    e = jnp.zeros(q.shape[:-1] + (3,), dtype=q.dtype).at[..., axis].set(1.0)
    return quat_rotate(q, e)


def quat_to_rotation_matrix(q: jax.Array) -> jax.Array:
    """(...,4) xyzw -> (...,3,3) rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotation_matrix_to_quat(m: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) xyzw. Branch-free Shepperd's method.

    Replaces pytorch3d.transforms.matrix_to_quaternion (used by the reference
    Lee controller for the desired-orientation computation). Evaluates all
    four candidate quaternions and selects the numerically strongest one with
    jnp.where, so it vmaps/jits without data-dependent control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # squared magnitudes (clamped to >=0 before sqrt)
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # safe_sqrt: near identity/axis-aligned attitudes three of these are
    # exactly 0 and plain sqrt would leak NaN into reverse-mode gradients
    # through the unselected where-branches below
    qw = 0.5 * safe_sqrt(qw2)
    qx = 0.5 * safe_sqrt(qx2)
    qy = 0.5 * safe_sqrt(qy2)
    qz = 0.5 * safe_sqrt(qz2)

    # candidate 0: w dominant
    c0 = jnp.stack(
        [
            (m21 - m12) / (4.0 * jnp.maximum(qw, 1e-12)),
            (m02 - m20) / (4.0 * jnp.maximum(qw, 1e-12)),
            (m10 - m01) / (4.0 * jnp.maximum(qw, 1e-12)),
            qw,
        ],
        axis=-1,
    )
    # candidate 1: x dominant
    c1 = jnp.stack(
        [
            qx,
            (m01 + m10) / (4.0 * jnp.maximum(qx, 1e-12)),
            (m02 + m20) / (4.0 * jnp.maximum(qx, 1e-12)),
            (m21 - m12) / (4.0 * jnp.maximum(qx, 1e-12)),
        ],
        axis=-1,
    )
    # candidate 2: y dominant
    c2 = jnp.stack(
        [
            (m01 + m10) / (4.0 * jnp.maximum(qy, 1e-12)),
            qy,
            (m12 + m21) / (4.0 * jnp.maximum(qy, 1e-12)),
            (m02 - m20) / (4.0 * jnp.maximum(qy, 1e-12)),
        ],
        axis=-1,
    )
    # candidate 3: z dominant
    c3 = jnp.stack(
        [
            (m02 + m20) / (4.0 * jnp.maximum(qz, 1e-12)),
            (m12 + m21) / (4.0 * jnp.maximum(qz, 1e-12)),
            qz,
            (m10 - m01) / (4.0 * jnp.maximum(qz, 1e-12)),
        ],
        axis=-1,
    )

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)[..., None]
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (...,4cand,4comp)
    q = jnp.take_along_axis(cands, best[..., None], axis=-2).squeeze(-2)
    return normalize(q)


def quat_from_euler_xyz(roll, pitch, yaw) -> jax.Array:
    """Intrinsic XYZ euler angles -> xyzw quaternion (matches reference)."""
    cy = jnp.cos(yaw * 0.5)
    sy = jnp.sin(yaw * 0.5)
    cr = jnp.cos(roll * 0.5)
    sr = jnp.sin(roll * 0.5)
    cp = jnp.cos(pitch * 0.5)
    sp = jnp.sin(pitch * 0.5)
    qw = cy * cr * cp + sy * sr * sp
    qx = cy * sr * cp - sy * cr * sp
    qy = cy * cr * sp + sy * sr * cp
    qz = sy * cr * cp - cy * sr * sp
    return jnp.stack([qx, qy, qz, qw], axis=-1)


def quat_from_euler_xyz_tensor(euler: jax.Array) -> jax.Array:
    return quat_from_euler_xyz(euler[..., 0], euler[..., 1], euler[..., 2])


def get_euler_xyz(q: jax.Array):
    """xyzw quaternion -> (roll, pitch, yaw), each wrapped mod 2*pi.

    Matches the reference's get_euler_xyz including the mod-2pi wrap (the
    callers re-wrap with ssa to [-pi, pi]).
    """
    qx, qy, qz, qw = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (qw * qx + qy * qz)
    cosr_cosp = qw * qw - qx * qx - qy * qy + qz * qz
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)

    sinp = 2.0 * (qw * qy - qz * qx)
    pitch = jnp.where(
        jnp.abs(sinp) >= 1.0,
        jnp.sign(sinp) * (jnp.pi / 2.0),
        # inner where keeps the unselected arcsin branch away from |x|=1,
        # where its derivative is inf (NaN leak into rollout gradients)
        jnp.arcsin(jnp.where(jnp.abs(sinp) >= 1.0, 0.0,
                             jnp.clip(sinp, -1.0, 1.0))),
    )

    siny_cosp = 2.0 * (qw * qz + qx * qy)
    cosy_cosp = qw * qw + qx * qx - qy * qy - qz * qz
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)

    two_pi = 2.0 * jnp.pi
    return roll % two_pi, pitch % two_pi, yaw % two_pi


def get_euler_xyz_tensor(q: jax.Array) -> jax.Array:
    roll, pitch, yaw = get_euler_xyz(q)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def vehicle_frame_quat_from_quat(body_quat: jax.Array) -> jax.Array:
    """Yaw-only ('vehicle frame') quaternion from a full-body quaternion."""
    yaw = get_euler_xyz_tensor(body_quat)[..., 2]
    zeros = jnp.zeros_like(yaw)
    return quat_from_euler_xyz(zeros, zeros, yaw)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
    theta = (angle / 2.0)[..., None]
    xyz = normalize(axis) * jnp.sin(theta)
    w = jnp.cos(theta)
    return quat_unit(jnp.concatenate([xyz, w], axis=-1))


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by world-frame angular velocity over dt.

    Exponential-map update: q' = exp(0.5 * dt * omega) * q, renormalized.
    Accurate for large omega*dt (unlike the first-order q + 0.5*dt*w*q).
    """
    angle = safe_norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * dt * angle
    # sinc-based form avoids the 0/0 at angle == 0
    k = 0.5 * dt * jnp.sinc(half / jnp.pi)  # = sin(half)/angle
    dq = jnp.concatenate([omega_world * k, jnp.cos(half)], axis=-1)
    return quat_unit(quat_mul(dq, q))


# ---------------------------------------------------------------------------
# rigid transforms
# ---------------------------------------------------------------------------


def tf_apply(q, t, v):
    return quat_apply(q, v) + t


def tf_vector(q, v):
    return quat_apply(q, v)


def tf_inverse(q, t):
    q_inv = quat_conjugate(q)
    return q_inv, -quat_apply(q_inv, t)


def tf_combine(q1, t1, q2, t2):
    return quat_mul(q1, q2), quat_apply(q1, t2) + t1


def get_basis_vector(q, v):
    return quat_rotate(q, v)
