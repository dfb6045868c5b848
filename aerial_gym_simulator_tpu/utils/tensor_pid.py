"""Batched PID controller with anti-windup (reference utils/tensor_pid.py).

Functional JAX formulation: the controller state (integral, prev_error,
reset flag) is an explicit pytree so the PID composes with jit/vmap/scan
instead of mutating buffers in place.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .math import tensor_clamp


class PIDState(NamedTuple):
    integral: jax.Array       # (N, D)
    prev_error: jax.Array     # (N, D)
    just_reset: jax.Array     # (N, D) 1.0 right after reset (skip D-term)


class TensorPID:
    """Gains/limits are static; call update(state, error) -> (state, out)."""

    def __init__(self, num_envs, num_dims, Kp, Kd, Ki, dt,
                 integral_min_limit, integral_max_limit,
                 derivative_saturation_min_limit,
                 derivative_saturation_max_limit,
                 output_min_limit, output_max_limit):
        self.num_envs = num_envs
        self.num_dims = num_dims
        f = lambda v: jnp.asarray(v, jnp.float32)
        self.Kp, self.Kd, self.Ki = f(Kp), f(Kd), f(Ki)
        self.dt = float(dt)
        self.integral_min = f(integral_min_limit)
        self.integral_max = f(integral_max_limit)
        self.deriv_min = f(derivative_saturation_min_limit)
        self.deriv_max = f(derivative_saturation_max_limit)
        self.out_min = f(output_min_limit)
        self.out_max = f(output_max_limit)

    def init_state(self) -> PIDState:
        z = jnp.zeros((self.num_envs, self.num_dims), jnp.float32)
        return PIDState(integral=z, prev_error=z, just_reset=jnp.ones_like(z))

    def update(self, state: PIDState, error: jax.Array):
        integral = state.integral + error * self.dt
        p_term = self.Kp * error
        d_term = self.Kd * (1.0 - state.just_reset) \
            * (error - state.prev_error) / self.dt
        i_term = tensor_clamp(self.Ki * integral, self.integral_min,
                              self.integral_max)
        d_term = tensor_clamp(d_term, self.deriv_min, self.deriv_max)
        out = tensor_clamp(p_term + d_term + i_term, self.out_min, self.out_max)
        new_state = PIDState(integral=integral, prev_error=error,
                             just_reset=jnp.zeros_like(state.just_reset))
        return new_state, out

    def reset(self, state: PIDState) -> PIDState:
        return self.init_state()

    def reset_idx(self, state: PIDState, mask: jax.Array) -> PIDState:
        """Masked reset (mask: (N,) bool/0-1)."""
        m = mask.reshape(-1, 1).astype(bool)
        z = jnp.zeros_like(state.integral)
        return PIDState(
            integral=jnp.where(m, z, state.integral),
            prev_error=jnp.where(m, z, state.prev_error),
            just_reset=jnp.where(m, jnp.ones_like(z), state.just_reset),
        )
