"""First-order motor-lag model with asymmetric time constants.

Behavioral parity with the reference's torch.jit kernels
(aerial_gym/control/motor_model.py:88-251):

  * reference thrusts clamped to [min_thrust, max_thrust],
  * time constant chosen per motor: 'decreasing' when the commanded change
    opposes the current thrust sign, else 'increasing',
  * mixing factor 1/(dt + tau) (discrete) or 1/tau (continuous),
  * integration in thrust domain or rpm domain (use_rps: thrust = kt * rpm^2),
  * Euler or RK4 integration with a rate clamp at every stage.

Pure functions over (N, M) arrays; XLA fuses the whole chain into the
surrounding step program (the torch.jit.script boundary disappears).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..sim.structs import MotorParams
from ..utils.math import safe_sqrt, tensor_clamp


def _rate(error, mixing_factor, max_rate):
    return tensor_clamp(mixing_factor * error, -max_rate, max_rate)


def _rk4_delta(ref, cur, mixing_factor, max_rate, dt):
    """RK4 on d(state)/dt = clip(mixing*(ref-state)); returns the delta."""
    k1 = _rate(ref - cur, mixing_factor, max_rate)
    k2 = _rate(ref - (cur + 0.5 * dt * k1), mixing_factor, max_rate)
    k3 = _rate(ref - (cur + 0.5 * dt * k2), mixing_factor, max_rate)
    k4 = _rate(ref - (cur + dt * k3), mixing_factor, max_rate)
    return (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


def motor_step(
    p: MotorParams,
    dt,
    ref_thrust: jax.Array,          # (N, M) commanded thrusts
    current_thrust: jax.Array,      # (N, M)
    tau_inc: jax.Array,             # (N, M)
    tau_dec: jax.Array,             # (N, M)
    thrust_constant: jax.Array,     # (N, M) only used when use_rps
) -> jax.Array:
    """One dt of motor dynamics; returns the new thrust array."""
    ref_thrust = tensor_clamp(ref_thrust, p.min_thrust, p.max_thrust)
    err = ref_thrust - current_thrust
    tau = jnp.where(jnp.sign(current_thrust) * jnp.sign(err) < 0, tau_dec, tau_inc)
    if p.use_discrete_approximation:
        mixing = 1.0 / (dt + tau)
    else:
        mixing = 1.0 / tau

    if p.use_rps:
        # rpm-domain first-order response: f = kt * w^2
        safe_kt = jnp.maximum(thrust_constant, 1e-12)
        # safe_sqrt: gradient finite at thrust == 0 (min_thrust clamp), so
        # whole-rollout reverse-mode AD stays NaN-free
        cur_rpm = safe_sqrt(current_thrust / safe_kt)
        des_rpm = safe_sqrt(ref_thrust / safe_kt)
        if p.integration_scheme == "euler":
            new_rpm = cur_rpm + _rate(des_rpm - cur_rpm, mixing, p.max_thrust_rate) * dt
        else:
            new_rpm = cur_rpm + _rk4_delta(des_rpm, cur_rpm, mixing, p.max_thrust_rate, dt)
        return thrust_constant * new_rpm * new_rpm
    else:
        if p.integration_scheme == "euler":
            return current_thrust + _rate(err, mixing, p.max_thrust_rate) * dt
        else:
            return current_thrust + _rk4_delta(ref_thrust, current_thrust, mixing,
                                               p.max_thrust_rate, dt)
