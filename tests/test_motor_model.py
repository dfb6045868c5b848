"""Motor-lag golden tests: analytic first-order response (SURVEY.md sec. 4,
matching the reference's sys-id CSV methodology)."""

import jax.numpy as jnp
import numpy as np

from aerial_gym_simulator_tpu.ops.motor_model import motor_step
from aerial_gym_simulator_tpu.sim.structs import MotorParams


def make_params(use_rps=False, scheme="rk4", discrete=False, tau=0.04):
    f = lambda x: jnp.asarray(x, jnp.float32)
    return MotorParams(
        allocation_matrix=f(np.zeros((6, 4))),
        allocation_pinv=f(np.zeros((4, 6))),
        motor_directions=f([1, -1, 1, -1]),
        min_thrust=f(0.0), max_thrust=f(2.0), max_thrust_rate=f(1e5),
        tau_inc_min=f(tau), tau_inc_max=f(tau),
        tau_dec_min=f(tau), tau_dec_max=f(tau),
        thrust_constant_min=f(1.2e-5), thrust_constant_max=f(1.2e-5),
        thrust_to_torque_ratio=f(0.01),
        use_rps=use_rps, use_discrete_approximation=discrete,
        integration_scheme=scheme, num_motors=4,
    )


def run(p, steps, dt=0.01, ref=1.0, init=0.0, kt=1.2e-5):
    N, M = 2, 4
    thrust = jnp.full((N, M), init, jnp.float32)
    tau = jnp.full((N, M), 0.04, jnp.float32)
    ktm = jnp.full((N, M), kt, jnp.float32)
    refs = jnp.full((N, M), ref, jnp.float32)
    for _ in range(steps):
        thrust = motor_step(p, dt, refs, thrust, tau, tau, ktm)
    return np.asarray(thrust)


def test_force_domain_rk4_matches_analytic_exponential():
    # continuous mixing: df/dt = (ref - f)/tau -> f(t) = ref (1 - e^{-t/tau})
    p = make_params(use_rps=False, scheme="rk4", discrete=False)
    t = 0.05
    out = run(p, steps=5, dt=0.01, ref=1.0)
    expected = 1.0 - np.exp(-t / 0.04)
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_euler_less_accurate_than_rk4():
    p_e = make_params(scheme="euler", discrete=False)
    p_r = make_params(scheme="rk4", discrete=False)
    expected = 1.0 - np.exp(-0.05 / 0.04)
    err_e = abs(run(p_e, 5)[0, 0] - expected)
    err_r = abs(run(p_r, 5)[0, 0] - expected)
    assert err_r < err_e


def test_discrete_mixing_factor():
    # one euler step: f' = f + dt * (ref-f)/(dt+tau)
    p = make_params(scheme="euler", discrete=True)
    out = run(p, 1, dt=0.01, ref=1.0, init=0.0)
    np.testing.assert_allclose(out, 0.01 / (0.01 + 0.04), rtol=1e-5)


def test_rpm_domain_steady_state():
    p = make_params(use_rps=True, scheme="rk4", discrete=False)
    out = run(p, 400, dt=0.01, ref=1.5, init=0.5)
    np.testing.assert_allclose(out, 1.5, rtol=1e-3)


def test_thrust_clamped_to_limits():
    p = make_params(use_rps=False, scheme="rk4", discrete=False)
    out = run(p, 200, ref=5.0)   # ref above max_thrust=2
    assert np.all(out <= 2.0 + 1e-5)


def test_rate_clamp():
    p = make_params(scheme="euler", discrete=False)
    p = p.replace(max_thrust_rate=jnp.asarray(1.0, jnp.float32))
    out = run(p, 1, dt=0.01, ref=2.0, init=0.0)
    # rate clamped at 1 N/s -> one step moves at most 0.01
    np.testing.assert_allclose(out, 0.01, rtol=1e-5)
