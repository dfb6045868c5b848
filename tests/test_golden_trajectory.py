"""Golden-trajectory parity: the fused jitted step vs an independent
pure-numpy reimplementation of the hover dynamics (motor lag -> allocation
wrench -> semi-implicit 6-DoF integration), over 200 steps.

This is the BASELINE 'exact-trajectory parity on the hover task' check:
two independent implementations of the documented dynamics must agree to
float32 accumulation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.sim import dynamics
from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder


def numpy_reference_step(pos, quat, linvel, angvel_w, thrust, ref_thrust,
                         alloc, mass, inertia, inv_inertia, dt, tau,
                         lin_damp, ang_damp, g=np.array([0, 0, -9.81])):
    """One substep of the documented dynamics, all in float64 numpy."""
    # motor: discrete first-order lag (RK4 on clipped rate; rate not clamped
    # here because the test uses rates far below the clamp)
    mix = 1.0 / (dt + tau)

    def f(x):
        return mix * (ref_thrust - x)
    k1 = f(thrust)
    k2 = f(thrust + 0.5 * dt * k1)
    k3 = f(thrust + 0.5 * dt * k2)
    k4 = f(thrust + dt * k3)
    thrust = thrust + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)

    wrench = alloc @ thrust
    force_b, torque_b = wrench[:3], wrench[3:]

    # quat (xyzw) rotate helpers
    def rot(q, v):
        qv, qw = q[:3], q[3]
        return v + 2.0 * np.cross(qv, np.cross(qv, v) + qw * v)

    def rot_inv(q, v):
        return rot(np.array([-q[0], -q[1], -q[2], q[3]]), v)

    accel = rot(quat, force_b) / mass + g
    linvel = (linvel + dt * accel) * max(0.0, 1.0 - lin_damp * dt)
    pos = pos + dt * linvel

    w_b = rot_inv(quat, angvel_w)
    w_dot = inv_inertia @ (torque_b - np.cross(w_b, inertia @ w_b))
    w_b = (w_b + dt * w_dot) * max(0.0, 1.0 - ang_damp * dt)
    angvel_w = rot(quat, w_b)

    # quaternion exponential integration with world-frame angular velocity
    wn = np.linalg.norm(angvel_w)
    if wn > 1e-12:
        axis = angvel_w / wn
        half = 0.5 * wn * dt
        dq = np.concatenate([axis * np.sin(half), [np.cos(half)]])
        # world-frame omega -> left-multiply
        x1, y1, z1, w1 = dq
        x2, y2, z2, w2 = quat
        quat = np.array([
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ])
        quat = quat / np.linalg.norm(quat)
    return pos, quat, linvel, angvel_w, thrust


def test_hover_trajectory_matches_numpy_reference():
    env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                 "no_control", num_envs=2, seed=0)
    env.reset()
    p = env.params
    # force RPM-domain off for the analytic reference
    mp = p.motor.replace(use_rps=False)
    p = p.replace(motor=mp,
                  robot=p.robot.replace(enable_disturbance=False))

    N = 2
    st = env.state
    tau = 0.04
    st = st.replace(
        pos=jnp.zeros((N, 3)),
        quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (N, 1)),
        linvel=jnp.zeros((N, 3)), angvel=jnp.zeros((N, 3)),
        motor_thrust=jnp.zeros((N, 4)),
        motor_tau_inc=jnp.full((N, 4), tau),
        motor_tau_dec=jnp.full((N, 4), tau))

    # slightly asymmetric motor commands -> translation + rotation
    ref = np.array([0.62, 0.60, 0.62, 0.60], np.float32)
    actions = jnp.tile(jnp.asarray(ref), (N, 1))

    step = jax.jit(lambda s: dynamics.env_step(p, s, actions))
    for _ in range(200):
        st = step(st)

    # numpy replay in float64
    alloc = np.asarray(p.motor.allocation_matrix, np.float64)
    mass = float(p.robot.mass)
    inertia = np.asarray(p.robot.inertia, np.float64)
    inv_inertia = np.asarray(p.robot.inv_inertia, np.float64)
    dt = float(p.dt)
    pos = np.zeros(3)
    quat = np.array([0.0, 0.0, 0.0, 1.0])
    linvel = np.zeros(3)
    angvel = np.zeros(3)
    thrust = np.zeros(4)
    for _ in range(200):
        pos, quat, linvel, angvel, thrust = numpy_reference_step(
            pos, quat, linvel, angvel, thrust, ref.astype(np.float64), alloc,
            mass, inertia, inv_inertia, dt, tau,
            float(p.robot.linear_damping), float(p.robot.angular_damping))

    got_pos = np.asarray(st.pos[0])
    got_quat = np.asarray(st.quat[0])
    got_thrust = np.asarray(st.motor_thrust[0])
    np.testing.assert_allclose(got_thrust, thrust, atol=1e-4)
    np.testing.assert_allclose(got_pos, pos, atol=2e-3)
    q = got_quat if got_quat[3] * quat[3] >= 0 else -got_quat
    np.testing.assert_allclose(q, quat, atol=2e-3)
    # both envs identical (same commands, no randomness in this config)
    np.testing.assert_allclose(np.asarray(st.pos[1]), got_pos, atol=1e-6)
