"""Position-setpoint task variants (sim2real / px4 / end-to-end /
acceleration / reconfigurable / morphy).

Parity targets (reference task/position_setpoint_task_*/ *.py and their
config/task_config/*.py):

  position_setpoint_task_sim2real          lmf2 + velocity controller, noisy
                                           17-d obs, progress+yaw rewards
  position_setpoint_task_acceleration_sim2real
                                           lmf2 + acceleration controller,
                                           vehicle-frame action penalties
  position_setpoint_task_sim2real_end_to_end
                                           tinyprop, direct motor commands,
                                           15-d rot6d obs, progress reward
  position_setpoint_task_sim2real_px4      x500, direct motor commands
  position_setpoint_task_reconfigurable    snakey6, motor commands + joint
                                           velocity targets, joint-state obs
  position_setpoint_task_morphy            morphy, motor commands, passive
                                           arm joint-state obs + penalties

Every variant's full RL step (action scaling -> sim -> reward -> reset ->
noisy obs) is one pure function compiled by XLA; the variant name is a
static trace-time switch so each build compiles only its own math.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..control.controllers import compute_robot_obs
from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..sim.structs import SimParams, SimState
from ..utils.logging import CustomLogger
from ..utils.math import (
    exp_func,
    exp_penalty_func,
    get_euler_xyz_tensor,
    interpolate_ratio,
    quat_apply_inverse,
    quat_axis,
    quat_from_euler_xyz_tensor,
    quat_rotate,
    quat_to_rotation_matrix,
    ssa,
)

logger = CustomLogger("position_setpoint_variants")


def abs_exp_func(x, gain, exp):
    """gain * e^(-exp*|x|) (reference abs_exp_func)."""
    return gain * jnp.exp(-exp * jnp.abs(x))


def abs_exp_penalty_func(x, gain, exp):
    return gain * (jnp.exp(-exp * jnp.abs(x)) - 1.0)


def matrix_to_rotation_6d(m):
    """First two rows of R flattened (pytorch3d convention used by the
    end-to-end/px4 tasks' observation encodings)."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


@dataclass
class VariantTaskConfig:
    variant: str = "sim2real"
    seed: int = 1
    sim_name: str = "base_sim"
    env_name: str = "empty_env"
    robot_name: str = "lmf2"
    controller_name: str = "lmf2_velocity_control"
    args: dict = field(default_factory=dict)
    num_envs: int = 16
    use_warp: bool = False
    headless: bool = True
    device: str = "tpu"
    observation_space_dim: int = 17
    privileged_observation_space_dim: int = 0
    action_space_dim: int = 4
    episode_len_steps: int = 800
    return_state_before_reset: bool = False
    crash_dist: float = 10.0
    # [0,1]-ratio action scaling (motor-command variants)
    action_limit_min: Tuple[float, ...] = ()
    action_limit_max: Tuple[float, ...] = ()
    num_motors: int = 4
    num_joints: int = 0
    reward_parameters: dict = field(default_factory=dict)


# -- variant config factories (reference config/task_config/*.py values) ----


def Sim2RealConfig() -> VariantTaskConfig:
    return VariantTaskConfig(
        variant="sim2real", robot_name="lmf2",
        controller_name="lmf2_velocity_control", num_envs=16,
        observation_space_dim=17, action_space_dim=4, episode_len_steps=800,
        crash_dist=10.0)


def AccelerationSim2RealConfig() -> VariantTaskConfig:
    return VariantTaskConfig(
        variant="acceleration_sim2real", robot_name="lmf2",
        controller_name="lmf2_acceleration_control", num_envs=16,
        observation_space_dim=17, action_space_dim=4, episode_len_steps=800,
        crash_dist=10.0)


def EndToEndConfig() -> VariantTaskConfig:
    # seed 56: the reference's active (EVAL=False) training config,
    # position_setpoint_task_sim2real_end_to_end_config.py:7
    return VariantTaskConfig(
        variant="end_to_end", seed=56, robot_name="tinyprop",
        controller_name="no_control", num_envs=4096,
        observation_space_dim=15, action_space_dim=4, episode_len_steps=600,
        crash_dist=1.5,
        action_limit_min=(0.2,) * 4, action_limit_max=(1.2,) * 4)


def Px4Config() -> VariantTaskConfig:
    # seed 56: reference position_setpoint_task_sim2real_px4_config.py:7
    return VariantTaskConfig(
        variant="px4", seed=56, robot_name="x500", controller_name="no_control",
        num_envs=24, observation_space_dim=15, action_space_dim=4,
        episode_len_steps=500, crash_dist=6.5,
        action_limit_min=(0.0,) * 4, action_limit_max=(8.0,) * 4)


def ReconfigurableConfig() -> VariantTaskConfig:
    nm, nj = 6, 10
    return VariantTaskConfig(
        variant="reconfigurable", sim_name="base_sim_2ms",
        env_name="empty_env_2ms", robot_name="snakey6",
        controller_name="no_control", num_envs=1024,
        observation_space_dim=13 + (nm + nj) + 2 * nj,
        action_space_dim=nm + nj, episode_len_steps=500, crash_dist=3.0,
        action_limit_min=tuple([0.0] * nm + [1.0] * nj),
        action_limit_max=tuple([15.0] * nm + [-1.0] * nj),
        num_motors=nm, num_joints=nj)


def MorphyConfig() -> VariantTaskConfig:
    # reference position_setpoint_task_morphy_config.py:7-8 runs morphy at
    # the 2 ms sim dt (5 substeps per env step)
    return VariantTaskConfig(
        variant="morphy", sim_name="base_sim_2ms", env_name="empty_env_2ms",
        robot_name="morphy", controller_name="no_control",
        num_envs=1024, observation_space_dim=13 + 4 + 16, action_space_dim=4,
        episode_len_steps=500, crash_dist=3.0,
        action_limit_min=(0.0,) * 4, action_limit_max=(2.0,) * 4,
        num_motors=4, num_joints=8)


# ---------------------------------------------------------------------------
# rewards (jitted; reference compute_reward of each variant file)
# ---------------------------------------------------------------------------


def _sim2real_reward(pos_error, prev_dist, yaw_error, linvel_b, angvel_b,
                     crashes, action, prev_action):
    """reference position_setpoint_task_sim2real.py compute_reward."""
    dist = jnp.linalg.norm(pos_error, axis=-1)
    pos_reward = (exp_func(dist, 2.0, 1.0) + exp_func(dist, 3.0, 10.0)
                  + abs_exp_func(dist, 3.0, 50.0))
    speed_reward = exp_func(jnp.linalg.norm(linvel_b, axis=-1), 1.0, 3.0)
    dist_reward = (20.0 - dist) / 40.0
    action_penalty = jnp.sum(abs_exp_penalty_func(action, 0.2, 4.0), axis=-1)
    action_difference_penalty = jnp.sum(
        abs_exp_penalty_func(action - prev_action, 0.3, 6.0), axis=-1)
    closer_reward = 400.0 * (prev_dist - dist)
    yaw_error_reward = abs_exp_func(yaw_error, 2.0, 3.0)
    total = ((pos_reward + dist_reward
              + pos_reward * (speed_reward + action_penalty + closer_reward / 10.0))
             + action_penalty + action_difference_penalty + closer_reward
             + yaw_error_reward)
    crashes = jnp.where(dist > 10.0, jnp.ones_like(crashes), crashes)
    total = jnp.where(crashes > 0.0, -50.0 * jnp.ones_like(total), total)
    return total, crashes


def _acceleration_reward(pos_error, prev_dist, yaw_error, linvel_b, angvel_b,
                         crashes, action_vf, prev_action_vf):
    """reference position_setpoint_task_acceleration_sim2real.py."""
    dist = jnp.linalg.norm(pos_error, axis=-1)
    pos_reward = (exp_func(dist, 2.0, 1.0) + exp_func(dist, 3.0, 10.0)
                  + abs_exp_func(dist, 3.0, 50.0))
    close_pos_reward = exp_func(dist, 2.0, 1.0)
    speed_reward = exp_func(jnp.linalg.norm(linvel_b, axis=-1), 2.0, 2.5)
    action_penalty = jnp.sum(abs_exp_penalty_func(action_vf, 0.3, 4.0), axis=-1)
    action_difference_penalty = jnp.sum(
        abs_exp_penalty_func(action_vf - prev_action_vf, 0.4, 6.0), axis=-1)
    closer_reward = jnp.where(dist < prev_dist, 400.0 * (prev_dist - dist),
                              1200.0 * (prev_dist - dist))
    yaw_error_reward = abs_exp_func(yaw_error, 3.0, 5.0)
    total = ((pos_reward
              + pos_reward * (closer_reward / 9.0 + action_penalty / 3.0
                              + speed_reward / 1.5))
             + action_penalty + action_difference_penalty + closer_reward
             + yaw_error_reward + close_pos_reward + speed_reward * 0.2)
    crashes = jnp.where(dist > 10.0, jnp.ones_like(crashes), crashes)
    total = jnp.where(crashes > 0.0, -50.0 * jnp.ones_like(total), total)
    return total, crashes


def _motor_command_reward(pos_error, prev_pos_error, quat, linvel, angvel_b,
                          crashes, action, prev_action, *, z_scale,
                          hover_thrust, closer_gains, upright2, align_gains,
                          angvel_gain, act_diff, crash_dist, closer_big):
    """Shared shape of the end-to-end / px4 rewards (they differ only in
    constants; reference *_end_to_end.py / *_px4.py compute_reward)."""
    target_dist = jnp.linalg.norm(pos_error, axis=-1)
    prev_target_dist = jnp.linalg.norm(prev_pos_error, axis=-1)
    pe = pos_error.at[..., 2].multiply(z_scale)
    pos_reward = (jnp.sum(exp_func(pe, 10.0, 10.0), axis=-1)
                  + jnp.sum(exp_func(pe, 2.0, 2.0), axis=-1))
    ups = quat_axis(quat, 2)
    tiltage = 1.0 - ups[..., 2]
    upright_reward = exp_func(tiltage, 2.5, 5.0)
    if upright2:
        upright_reward = upright_reward + exp_func(tiltage, 2.5, 2.0)
    forw = quat_axis(quat, 0)
    alignment = 1.0 - forw[..., 0]
    alignment_reward = exp_func(alignment, align_gains[0], 5.0)
    if align_gains[1] > 0.0:
        alignment_reward = alignment_reward + exp_func(alignment, align_gains[1], 2.0)
    angvel_reward = jnp.sum(exp_func(angvel_b, angvel_gain, 10.0), axis=-1)
    vel_reward = jnp.sum(exp_func(linvel, 1.0, 5.0), axis=-1)
    action_cost = jnp.sum(
        exp_penalty_func(action - hover_thrust, 0.01, 10.0), axis=-1)
    closer_by = prev_target_dist - target_dist
    towards_goal = jnp.where(closer_by >= 0, closer_gains[0] * closer_by,
                             closer_gains[1] * closer_by)
    action_difference_penalty = jnp.sum(
        exp_penalty_func(action - prev_action, act_diff[0], act_diff[1]), axis=-1)
    reward = towards_goal + (
        pos_reward * (alignment_reward + vel_reward + angvel_reward
                      + action_difference_penalty)
        + (angvel_reward + vel_reward + upright_reward + pos_reward
           + action_cost)) / 100.0
    del closer_big
    crashes = jnp.where(target_dist > crash_dist, jnp.ones_like(crashes), crashes)
    return reward, crashes


def _reconfigurable_reward(pos_error, quat, angvel_b, crashes):
    """reference position_setpoint_task_reconfigurable.py compute_reward."""
    dist = jnp.linalg.norm(pos_error, axis=-1)
    pos_reward = exp_func(dist, 3.0, 8.0) + exp_func(dist, 0.5, 1.0)
    dist_reward = (20.0 - dist) / 40.0
    euler = ssa(get_euler_xyz_tensor(quat))
    roll, pitch = euler[..., 0], euler[..., 1]
    up_reward = exp_func(roll, 3.0, 5.0) + exp_func(pitch, 3.0, 5.0)
    spinnage = jnp.linalg.norm(angvel_b, axis=-1)
    ang_vel_reward = exp_func(spinnage, 3.0, 10.5)
    yaw_rate_special = exp_func(jnp.abs(angvel_b[..., 2]), 5.0, 20.5)
    total = (pos_reward + dist_reward + yaw_rate_special
             + pos_reward * (up_reward + ang_vel_reward + yaw_rate_special))
    crashes = jnp.where(dist > 3.0, jnp.ones_like(crashes), crashes)
    crashes = jnp.where(jnp.abs(roll) > 1.0, jnp.ones_like(crashes), crashes)
    crashes = jnp.where(jnp.abs(pitch) > 1.0, jnp.ones_like(crashes), crashes)
    total = jnp.where(crashes > 0.0, -20.0 * jnp.ones_like(total), total)
    return total, crashes


def _morphy_reward(pos_error, quat, angvel_b, joint_vels, crashes, action,
                   prev_action):
    """reference position_setpoint_task_morphy.py compute_reward."""
    dist = jnp.linalg.norm(pos_error, axis=-1)
    pos_reward = exp_func(dist, 4.0, 12.0) + exp_func(dist, 1.0, 3.0)
    dist_reward = (20.0 - dist) / 40.0
    ups = quat_axis(quat, 2)
    tiltage = jnp.abs(1.0 - ups[..., 2])
    euler = ssa(get_euler_xyz_tensor(quat))
    roll, pitch = euler[..., 0], euler[..., 1]
    up_reward = exp_func(tiltage, 5.0, 25.0)
    spinnage = jnp.linalg.norm(angvel_b, axis=-1)
    ang_vel_reward = exp_func(spinnage, 3.0, 10.5)
    action_difference = prev_action - action
    absolute_action_reward = -0.15 * jnp.sum(
        (action[..., :4] - 0.711225) ** 2, axis=-1)
    action_difference_reward = jnp.sum(
        exp_penalty_func(action_difference, 0.2, 5.0), axis=-1)
    joint_vel_reward = jnp.sum(exp_penalty_func(joint_vels, 0.30, 30.0), axis=-1)
    total = ((pos_reward + dist_reward + pos_reward * (up_reward + ang_vel_reward))
             + action_difference_reward + action_difference_reward * pos_reward
             + absolute_action_reward + joint_vel_reward)
    crashes = jnp.where(dist > 3.0, jnp.ones_like(crashes), crashes)
    crashes = jnp.where(jnp.abs(roll) > 1.0, jnp.ones_like(crashes), crashes)
    crashes = jnp.where(jnp.abs(pitch) > 1.0, jnp.ones_like(crashes), crashes)
    total = jnp.where(crashes > 0.0, -20.0 * jnp.ones_like(total), total)
    return total, crashes


# ---------------------------------------------------------------------------
# fused step
# ---------------------------------------------------------------------------


class VariantCarry(NamedTuple):
    sim: SimState
    prev_action: jax.Array       # scaled action applied at the previous step
    key: jax.Array               # obs-noise key


def _scale_actions(cfg: VariantTaskConfig, raw):
    if not cfg.action_limit_min:
        return raw
    lo = jnp.asarray(cfg.action_limit_min, jnp.float32)
    hi = jnp.asarray(cfg.action_limit_max, jnp.float32)
    if cfg.variant in ("reconfigurable", "morphy"):
        # [0,1]-ratio commands (reference torch.clamp(actions, 0, 1) +
        # interpolate, position_setpoint_task_config_reconfigurable.py)
        return interpolate_ratio(lo, hi, jnp.clip(raw, 0.0, 1.0))
    # symmetric policy range: clamp(-1,1) mapped so action 0 is mid-range
    # (reference end_to_end/px4 process_actions_for_task)
    a = jnp.clip(raw, -1.0, 1.0)
    return a * (hi - lo) / 2.0 + (hi + lo) / 2.0


def variant_task_step(params: SimParams, cfg: VariantTaskConfig,
                      carry: VariantCarry, raw_actions: jax.Array,
                      target_position: jax.Array, n_substeps=None):
    """One fused RL step of any variant (static dispatch on cfg.variant)."""
    v = cfg.variant
    state = carry.sim
    key, k_obs = jax.random.split(carry.key)

    action = _scale_actions(cfg, raw_actions)
    obs0 = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    prev_dist = jnp.linalg.norm(target_position - obs0.pos, axis=-1)
    prev_pos_error = target_position - obs0.pos

    # route joint velocity targets (reconfigurable variant splits the action
    # vector, reference position_setpoint_task_reconfigurable.py:54-57)
    if cfg.num_joints > 0 and v == "reconfigurable":
        motor_cmd = action[..., :cfg.num_motors]
        state = state.replace(dof_vel_target=action[..., cfg.num_motors:])
    else:
        motor_cmd = action[..., :cfg.num_motors] if cfg.num_joints > 0 else action

    state = dynamics.env_step(params, state, motor_cmd, n_substeps)

    obs = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    crashes = state.crashes

    if v == "sim2real":
        pos_err_vf = quat_apply_inverse(obs.vehicle_quat,
                                        target_position - obs.pos)
        yaw_error = -ssa(get_euler_xyz_tensor(obs.quat))[..., 2]
        reward, crashes = _sim2real_reward(
            pos_err_vf, prev_dist, yaw_error, obs.body_linvel, obs.body_angvel,
            crashes, action, carry.prev_action)
    elif v == "acceleration_sim2real":
        pos_err_b = quat_apply_inverse(obs.quat, target_position - obs.pos)
        yaw_error = -ssa(get_euler_xyz_tensor(obs.quat))[..., 2]
        act_vf = jnp.concatenate(
            [quat_rotate(obs.vehicle_quat, action[..., 0:3]),
             action[..., 3:4]], axis=-1)
        prev_vf = jnp.concatenate(
            [quat_rotate(obs.vehicle_quat, carry.prev_action[..., 0:3]),
             carry.prev_action[..., 3:4]], axis=-1)
        reward, crashes = _acceleration_reward(
            pos_err_b, prev_dist, yaw_error, obs.body_linvel, obs.body_angvel,
            crashes, act_vf, prev_vf)
    elif v == "end_to_end":
        reward, crashes = _motor_command_reward(
            target_position - obs.pos, prev_pos_error, obs.quat, obs.linvel,
            obs.body_angvel, crashes, action, carry.prev_action,
            z_scale=11.0, hover_thrust=9.81 * 0.372 / 4.0,
            closer_gains=(10.0, 15.0), upright2=False, align_gains=(6.0, 0.0),
            angvel_gain=0.3, act_diff=(1.3, 6.0), crash_dist=cfg.crash_dist,
            closer_big=False)
    elif v == "px4":
        reward, crashes = _motor_command_reward(
            target_position - obs.pos, prev_pos_error, obs.quat, obs.linvel,
            obs.body_angvel, crashes, action, carry.prev_action,
            z_scale=13.0, hover_thrust=9.81 * 1.6559999883174896 / 4.0,
            closer_gains=(50.0, 100.0), upright2=True, align_gains=(4.0, 2.0),
            angvel_gain=0.75, act_diff=(0.5, 6.0), crash_dist=cfg.crash_dist,
            closer_big=True)
    elif v == "reconfigurable":
        pos_err_vf = quat_apply_inverse(obs.vehicle_quat,
                                        target_position - obs.pos)
        reward, crashes = _reconfigurable_reward(pos_err_vf, obs.quat,
                                                 obs.body_angvel, crashes)
    elif v == "morphy":
        pos_err_vf = quat_apply_inverse(obs.vehicle_quat,
                                        target_position - obs.pos)
        reward, crashes = _morphy_reward(pos_err_vf, obs.quat, obs.body_angvel,
                                         state.dof_vel, crashes, action,
                                         carry.prev_action)
    else:
        raise ValueError(f"unknown variant {v}")

    truncations = (state.sim_steps > cfg.episode_len_steps).astype(jnp.float32)
    state = state.replace(crashes=crashes, truncations=truncations)
    state_pre_reset = state
    state = dynamics.post_reward_step(params, state)

    # reference position_setpoint_task_sim2real.py return_state_before_reset
    # True path: obs packed from the pre-reset state
    task_obs = _pack_obs(cfg,
                         state_pre_reset if cfg.return_state_before_reset
                         else state,
                         action, target_position, k_obs)
    # reference parity: prev_actions are zeroed for freshly reset envs
    done = jnp.maximum(crashes, truncations)
    prev_action = jnp.where(done.astype(bool)[:, None], 0.0, action)
    new_carry = VariantCarry(sim=state, prev_action=prev_action, key=key)
    return new_carry, task_obs, reward, crashes, truncations


def _pack_obs(cfg: VariantTaskConfig, state: SimState, action, target, key):
    """Variant observation packing incl. sensor-style noise (reference
    process_obs_for_task of each variant)."""
    obs = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    pos_error = target - obs.pos
    v = cfg.variant
    ks = jax.random.split(key, 4)

    if v in ("sim2real", "acceleration_sim2real"):
        q = obs.quat * jnp.sign(obs.quat[..., 3:4])            # canonical sign
        euler = ssa(get_euler_xyz_tensor(q))
        euler_noisy = euler + 0.02 * jax.random.normal(ks[0], euler.shape)
        return jnp.concatenate([
            pos_error + 0.03 * jax.random.normal(ks[1], pos_error.shape),
            quat_from_euler_xyz_tensor(euler_noisy),
            obs.body_linvel + 0.02 * jax.random.normal(ks[2], (state.pos.shape[0], 3)),
            obs.body_angvel + 0.02 * jax.random.normal(ks[3], (state.pos.shape[0], 3)),
            action,
        ], axis=-1)

    if v in ("end_to_end", "px4"):
        euler = ssa(get_euler_xyz_tensor(obs.quat))
        euler_noisy = euler + (jnp.pi / 1032.0) * jax.random.normal(ks[0], euler.shape)
        rot6d = matrix_to_rotation_6d(
            quat_to_rotation_matrix(quat_from_euler_xyz_tensor(euler_noisy)))
        return jnp.concatenate([
            pos_error + 0.001 * jax.random.normal(ks[1], pos_error.shape),
            rot6d,
            obs.linvel + 0.002 * jax.random.normal(ks[2], (state.pos.shape[0], 3)),
            obs.body_angvel + 0.001 * jax.random.normal(ks[3], (state.pos.shape[0], 3)),
        ], axis=-1)

    # reconfigurable / morphy: exact 13-d state + actions + joint states
    base = jnp.concatenate([pos_error, obs.quat, obs.body_linvel,
                            obs.body_angvel], axis=-1)
    parts = [base, action]
    if cfg.num_joints > 0:
        parts += [state.dof_pos, state.dof_vel]
    return jnp.concatenate(parts, axis=-1)


@partial(jax.jit, static_argnums=(0, 2), donate_argnums=3)
def _jit_variant_step(params_key, params, cfg_key_and_cfg, carry, raw_actions,
                      target, n_substeps):
    del params_key
    cfg = cfg_key_and_cfg
    return variant_task_step(params, cfg, carry, raw_actions, target, n_substeps)


class PositionSetpointTaskVariant:
    """Gym-style task wrapper shared by all six variants."""

    CONFIG = VariantTaskConfig

    def __init__(self, task_config: VariantTaskConfig, seed=None,
                 num_envs=None, headless=None, device=None, use_warp=None):
        if seed is not None:
            task_config.seed = seed
        if num_envs is not None:
            task_config.num_envs = num_envs
        if headless is not None:
            task_config.headless = headless
        self.task_config = task_config

        self.sim_env = SimBuilder().build_env(
            sim_name=task_config.sim_name,
            env_name=task_config.env_name,
            robot_name=task_config.robot_name,
            controller_name=task_config.controller_name,
            num_envs=task_config.num_envs,
            seed=task_config.seed,
        )
        self.num_envs = self.sim_env.num_envs
        self.params = self.sim_env.params
        self._params_key = id(self.params)
        # freeze config (hashable static arg for jit)
        task_config.action_limit_min = tuple(task_config.action_limit_min)
        task_config.action_limit_max = tuple(task_config.action_limit_max)
        self._cfg_frozen = _FrozenCfg(task_config)

        self.observation_space_dim = task_config.observation_space_dim
        self.action_space_dim = task_config.action_space_dim
        self.target_position = jnp.zeros((self.num_envs, 3), jnp.float32)
        self.actions = jnp.zeros((self.num_envs, task_config.action_space_dim),
                                 jnp.float32)
        self.rewards = jnp.zeros((self.num_envs,), jnp.float32)
        self.terminations = jnp.zeros((self.num_envs,), jnp.float32)
        self.truncations = jnp.zeros((self.num_envs,), jnp.float32)
        self.infos: Dict = {}
        self.counter = 0
        self.task_obs = {
            "observations": jnp.zeros(
                (self.num_envs, task_config.observation_space_dim), jnp.float32),
            "priviliged_obs": jnp.zeros(
                (self.num_envs, task_config.privileged_observation_space_dim),
                jnp.float32),
            "collisions": jnp.zeros((self.num_envs, 1), jnp.float32),
            "rewards": jnp.zeros((self.num_envs, 1), jnp.float32),
        }
        self._carry = None

    # -- functional protocol (PPO) ---------------------------------------
    @property
    def state(self) -> SimState:
        return self.sim_env.state

    def make_step_fn(self):
        params = self.params
        cfg = self._cfg_frozen
        target = self.target_position

        def step_fn(carry, action):
            return variant_task_step(params, cfg, carry, action, target, None)

        self.reset()
        return step_fn, self._carry, self.task_obs["observations"]

    def set_carry(self, carry):
        self._carry = carry
        self.sim_env.state = carry.sim

    # -- gym API -----------------------------------------------------------
    def close(self):
        self.sim_env.delete_env()

    def reset(self):
        self.sim_env.reset()
        self._carry = VariantCarry(
            sim=self.sim_env.state,
            prev_action=jnp.zeros((self.num_envs,
                                   self.task_config.action_space_dim), jnp.float32),
            key=jax.random.PRNGKey(self.task_config.seed ^ 0x5eed),
        )
        self.task_obs["observations"] = _pack_obs(
            self._cfg_frozen, self.sim_env.state,
            jnp.zeros((self.num_envs, self.task_config.action_space_dim)),
            self.target_position, jax.random.PRNGKey(0))
        return self.get_return_tuple()

    def reset_idx(self, env_ids):
        self.sim_env.reset_idx(env_ids)
        # re-sync the step carry, else the per-env reset would be discarded
        # by the next _jit_variant_step (which consumes self._carry.sim)
        if self._carry is not None:
            self._carry = self._carry._replace(sim=self.sim_env.state)

    def render(self):
        return None

    def step(self, actions):
        self.counter += 1
        self.actions = jnp.asarray(actions, jnp.float32)
        n = jnp.int32(self.sim_env._sample_substeps())
        carry, task_obs, reward, term, trunc = _jit_variant_step(
            self._params_key, self.params, self._cfg_frozen, self._carry,
            self.actions, self.target_position, n)
        self.set_carry(carry)
        self.sim_env.step_counter += 1
        self.task_obs["observations"] = task_obs
        self.rewards = reward
        self.terminations = term
        self.truncations = trunc
        self.infos = {}
        return self.get_return_tuple()

    def get_return_tuple(self):
        return (self.task_obs, self.rewards, self.terminations,
                self.truncations, self.infos)


class _FrozenCfg:
    """Hashable immutable view of VariantTaskConfig for use as a jit static
    argument (dispatch fields only)."""

    _FIELDS = ("variant", "episode_len_steps", "crash_dist",
               "action_limit_min", "action_limit_max", "num_motors",
               "num_joints", "action_space_dim", "num_envs",
               "observation_space_dim", "return_state_before_reset")

    def __init__(self, cfg: VariantTaskConfig):
        for f in self._FIELDS:
            object.__setattr__(self, f, getattr(cfg, f))

    def __setattr__(self, *a):
        raise AttributeError("frozen")

    def _key(self):
        return tuple(getattr(self, f) for f in self._FIELDS)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _FrozenCfg) and self._key() == other._key()
