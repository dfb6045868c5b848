"""Quaternion/SO(3) math vs closed forms (SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.utils import math as m


def rand_quats(n, seed=0):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4).astype(np.float32)
    return jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True))


def test_quat_mul_identity():
    q = rand_quats(32)
    ident = jnp.broadcast_to(m.QUAT_IDENTITY, q.shape)
    np.testing.assert_allclose(m.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(m.quat_mul(ident, q), q, atol=1e-6)


def test_quat_mul_matches_matrix_product():
    qa, qb = rand_quats(16, 1), rand_quats(16, 2)
    Rab = m.quat_to_rotation_matrix(m.quat_mul(qa, qb))
    Ra_Rb = jnp.einsum("nij,njk->nik", m.quat_to_rotation_matrix(qa),
                       m.quat_to_rotation_matrix(qb))
    np.testing.assert_allclose(Rab, Ra_Rb, atol=1e-5)


def test_quat_rotate_matches_matrix():
    q = rand_quats(16, 3)
    v = jnp.asarray(np.random.RandomState(4).randn(16, 3), jnp.float32)
    Rv = jnp.einsum("nij,nj->ni", m.quat_to_rotation_matrix(q), v)
    np.testing.assert_allclose(m.quat_rotate(q, v), Rv, atol=1e-5)
    np.testing.assert_allclose(m.quat_rotate_inverse(q, m.quat_rotate(q, v)), v,
                               atol=1e-5)


def test_rotation_matrix_quat_roundtrip():
    q = rand_quats(64, 5)
    R = m.quat_to_rotation_matrix(q)
    q2 = m.rotation_matrix_to_quat(R)
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_euler_roundtrip():
    rng = np.random.RandomState(6)
    euler = jnp.asarray(
        np.stack([rng.uniform(-1.2, 1.2, 32), rng.uniform(-1.2, 1.2, 32),
                  rng.uniform(-np.pi + 0.1, np.pi - 0.1, 32)], -1), jnp.float32)
    q = m.quat_from_euler_xyz_tensor(euler)
    e2 = m.ssa(m.get_euler_xyz_tensor(q))
    np.testing.assert_allclose(e2, euler, atol=1e-4)


def test_vehicle_frame_is_yaw_only():
    q = rand_quats(16, 7)
    vq = m.vehicle_frame_quat_from_quat(q)
    e = m.ssa(m.get_euler_xyz_tensor(vq))
    np.testing.assert_allclose(e[:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(e[:, 1], 0.0, atol=1e-5)
    yaw = m.ssa(m.get_euler_xyz_tensor(q))[:, 2]
    np.testing.assert_allclose(e[:, 2], yaw, atol=1e-4)


def test_vee_hat_inverse():
    v = jnp.asarray(np.random.RandomState(8).randn(16, 3), jnp.float32)
    np.testing.assert_allclose(m.compute_vee_map(m.hat_map(v)), v, atol=1e-6)


def test_quat_integrate_constant_rate():
    # rotating about z at 1 rad/s for 1s in 100 steps == 1 rad yaw
    n = 100
    q = jnp.broadcast_to(m.QUAT_IDENTITY, (4, 4))
    w = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (4, 3))
    for _ in range(n):
        q = m.quat_integrate(q, w, 1.0 / n)
    yaw = m.ssa(m.get_euler_xyz_tensor(q))[:, 2]
    np.testing.assert_allclose(yaw, 1.0, atol=1e-4)
    np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-6)


def test_ssa_wraps():
    a = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 2 * np.pi])
    out = m.ssa(a)
    np.testing.assert_allclose(out, [0.0, -np.pi + 0.1, np.pi - 0.1, 0.0],
                               atol=1e-6)
