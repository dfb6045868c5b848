"""LiDAR / radar navigation tasks.

Parity with reference task/lidar_navigation_task/lidar_navigation_task.py and
task/radar_navigation_task/radar_navigation_task.py:

  * sensor: 48x120 world-frame pointcloud (dome lidar on magpie, fake-radar
    cone on lmf2_radar), converted to a range image, min-pooled (3, 6) down
    to 16x20, synthetic sensor corruption, inverse-range observation
    (lidar_navigation_task.py:286-365),
  * time-to-collision from the velocity component along each ray
    (:325-341) fed to a TTC penalty in the reward,
  * obs = [perturbed unit vec to goal, dist, perturbed roll/pitch,
    yaw error to a per-episode random target yaw, body vels, prev action,
    320 inverse-range pixels] (:440-469),
  * acceleration-setpoint action transform [2*a_xyz, yawrate*pi/3]
    (lidar_navigation_task_config.py:101-110),
  * reward: position + very-close (gated by yaw alignment) + velocity-
    direction + stable-at-goal + action penalties + TTC penalty, collision
    -10 (:554-720); success/crash/timeout accounting + curriculum identical
    to the camera navigation task.

The whole step (transform -> sim -> reward -> curriculum -> masked reset ->
render -> pointcloud processing -> obs) is ONE jitted function.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..control.controllers import compute_robot_obs
from ..sensors.raycast_sensor import render_lidar
from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..sim.structs import SimParams, SimState
from ..utils.logging import CustomLogger
from ..utils.math import interpolate_ratio, quat_apply_inverse, safe_norm, ssa
from .navigation_task import CurriculumConfig, curriculum_update

logger = CustomLogger("lidar_navigation_task")

DS_POOL = (3, 6)        # min-pool window: 48x120 -> 16x20
DS_SHAPE = (16, 20)


@dataclass
class LidarNavigationTaskConfig:
    seed: int = 1
    sim_name: str = "base_sim"
    env_name: str = "env_with_lidar_nav_obstacles"
    robot_name: str = "magpie"
    controller_name: str = "magpie_acceleration_control"
    args: dict = field(default_factory=dict)
    num_envs: int = 512
    use_warp: bool = True
    headless: bool = True
    device: str = "tpu"
    observation_space_dim: int = 13 + 4 + DS_SHAPE[0] * DS_SHAPE[1]
    privileged_observation_space_dim: int = 0
    action_space_dim: int = 4
    episode_len_steps: int = 110
    return_state_before_reset: bool = False
    target_min_ratio: Tuple[float, float, float] = (0.90, 0.15, 0.15)
    target_max_ratio: Tuple[float, float, float] = (0.92, 0.80, 0.80)
    max_yawrate: float = np.pi / 3.0
    success_distance: float = 1.0
    radar_mode: bool = False          # radar task: sparse invalid returns
    # reference parity: 80% of downsampled radar returns invalidated per
    # frame (radar_navigation_task.py:16-19). The anneal fields are a
    # TRAINING aid only: with anneal_env_steps > 0 the invalid fraction
    # ramps start -> parity over that many env steps, so the recurrent
    # policy first learns the cone geometry on dense returns and then
    # adapts to sparsity; the task always ENDS (and evals, where anneal
    # defaults to 0) at the parity 0.8 observation distribution.
    radar_invalid_prob: float = 0.8
    radar_invalid_prob_start: float = 0.2
    radar_invalid_anneal_env_steps: int = 0
    curriculum: CurriculumConfig = field(default_factory=lambda: CurriculumConfig(
        min_level=25, max_level=70, check_after_log_instances=2048,
        increase_step=2, decrease_step=1,
        success_rate_for_increase=0.7, success_rate_for_decrease=0.6))
    reward_parameters: dict = field(default_factory=lambda: {
        "pos_reward_magnitude": 3.0,
        "pos_reward_exponent": 1.0,
        "very_close_to_goal_reward_magnitude": 5.0,
        "very_close_to_goal_reward_exponent": 8.0,
        "vel_direction_component_reward_magnitude": 1.0,
        "x_action_diff_penalty_magnitude": 0.3,
        "x_action_diff_penalty_exponent": 5.0,
        "y_action_diff_penalty_magnitude": 0.3,
        "y_action_diff_penalty_exponent": 5.0,
        "z_action_diff_penalty_magnitude": 0.3,
        "z_action_diff_penalty_exponent": 5.0,
        "yawrate_action_diff_penalty_magnitude": 0.3,
        "yawrate_action_diff_penalty_exponent": 5.0,
        "x_absolute_action_penalty_magnitude": 0.1,
        "x_absolute_action_penalty_exponent": 0.3,
        "y_absolute_action_penalty_magnitude": 0.1,
        "y_absolute_action_penalty_exponent": 0.3,
        "z_absolute_action_penalty_magnitude": 0.15,
        "z_absolute_action_penalty_exponent": 1.0,
        "yawrate_absolute_action_penalty_magnitude": 0.15,
        "yawrate_absolute_action_penalty_exponent": 2.0,
        "collision_penalty": -10.0,
    })


def RadarNavigationTaskConfig() -> LidarNavigationTaskConfig:
    """reference radar_navigation_task_config.py."""
    cfg = LidarNavigationTaskConfig()
    cfg.env_name = "env_with_obstacles"
    cfg.robot_name = "lmf2_radar"
    cfg.controller_name = "lmf2_acceleration_control"
    cfg.radar_mode = True
    return cfg


@struct.dataclass
class LidarNavState:
    sim: SimState
    target_position: jax.Array       # (N, 3)
    target_yaw: jax.Array            # (N,)
    pos_error_prev: jax.Array        # (N, 3) vehicle frame
    prev_action: jax.Array           # (N, 4) transformed
    lidar_obs: jax.Array             # (N, 320) inverse-range
    ttc: jax.Array                   # (N,) time to collision
    env_steps: jax.Array             # scalar f32: cumulative env steps
    key: jax.Array
    curriculum_level: jax.Array      # scalar f32
    success_agg: jax.Array
    crash_agg: jax.Array
    timeout_agg: jax.Array


def action_transform(cfg: LidarNavigationTaskConfig, raw):
    """reference lidar_navigation_task_config.action_transformation_function."""
    a = jnp.clip(raw, -1.0, 1.0)
    return jnp.concatenate([2.0 * a[..., 0:3],
                            a[..., 3:4] * cfg.max_yawrate], axis=-1)


def _erf(mag, exp, v):
    return mag * jnp.exp(-(v * v) * exp)


def _epf(mag, exp, v):
    return mag * (jnp.exp(-(v * v) * exp) - 1.0)


def process_pointcloud(cfg: LidarNavigationTaskConfig, robot_pos, linvel,
                       pts, key, invalid_prob=None):
    """World pointcloud -> (inverse-range 16x20 obs, time-to-collision).

    Mirrors process_image_observation + add_noise_to_downsampled_lidar_data
    (lidar_navigation_task.py:286-365; radar variant :6-23).
    invalid_prob overrides cfg.radar_invalid_prob (may be traced — the
    annealing curriculum feeds a step-dependent scalar)."""
    N = pts.shape[0]
    dirs = pts - robot_pos[:, None, None, :]
    rng_img = safe_norm(dirs, axis=-1)                 # (N, 48, 120)
    rng_flat = rng_img.reshape(N, -1)
    unit_dir = dirs.reshape(N, -1, 3) / (rng_flat[..., None] + 1e-6)

    rng_img = jnp.where(rng_img > 10.0, 10.0, rng_img)
    rng_img = jnp.where(rng_img < 0.2, 10.0, rng_img)

    # time to collision: range along each ray / closing speed
    vel_along = jnp.sum(linvel[:, None, :] * unit_dir, axis=-1)
    ttc_all = jnp.where(vel_along > 0, rng_flat / (vel_along + 1e-6), 10.0)
    ttc = jnp.clip(jnp.min(ttc_all, axis=-1), 0.0, 10.0)

    # min pool (3, 6): 48x120 -> 16x20
    ds = -jax.lax.reduce_window(-rng_img, -jnp.inf, jax.lax.max,
                                (1,) + DS_POOL, (1,) + DS_POOL, "VALID")

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if cfg.radar_mode:
        # radar: 3% additive noise, then 80% of returns invalid (-1)
        noise_mask = jax.random.bernoulli(k1, 0.03, ds.shape)
        ds = ds + noise_mask * jax.random.uniform(k2, ds.shape,
                                                  minval=0.2, maxval=10.0)
        p_inv = cfg.radar_invalid_prob if invalid_prob is None else invalid_prob
        invalid = jax.random.bernoulli(k3, p_inv, ds.shape)
        ds = jnp.where(invalid, -1.0, ds)
    else:
        # lidar: 3% additive noise, 2% max-range, 2% low-range in lower rows
        noise_mask = jax.random.bernoulli(k1, 0.03, ds.shape)
        ds = ds + noise_mask * jax.random.uniform(k2, ds.shape,
                                                  minval=0.2, maxval=10.0)
        maxr_mask = jax.random.bernoulli(k3, 0.02, ds.shape)
        ds = jnp.where(maxr_mask, 10.0, ds)
        low_mask = jax.random.bernoulli(k4, 0.02, ds[:, 10:].shape)
        low_vals = jax.random.uniform(k5, ds[:, 10:].shape,
                                      minval=0.2, maxval=1.0)
        ds = ds.at[:, 10:].set(jnp.where(low_mask, low_vals, ds[:, 10:]))

    return (1.0 / ds).reshape(N, -1), ttc


def compute_reward(rp: dict, pos_error, prev_pos_error, vehicle_linvel,
                   body_angvel, yaw_error, crashes, action, prev_action,
                   ttc, curriculum_progress):
    """reference lidar_navigation_task.py:554-720 compute_reward."""
    mult = 1.0 + 2.0 * curriculum_progress
    dist = safe_norm(pos_error, axis=-1)
    pos_reward = _erf(rp["pos_reward_magnitude"], rp["pos_reward_exponent"], dist)
    very_close = _erf(rp["very_close_to_goal_reward_magnitude"],
                      rp["very_close_to_goal_reward_exponent"], dist)

    vel_norm = safe_norm(vehicle_linvel, axis=-1)
    vel_dir = vehicle_linvel / (vel_norm[..., None] + 1e-6)
    unit_to_goal = pos_error / (dist[..., None] + 1e-6)
    reasonable_vel = _erf(2.0, 2.0, vel_norm - 2.0)
    vel_dir_component = jnp.sum(vel_dir * unit_to_goal, axis=-1)
    vel_dir_reward = jnp.where(
        vel_dir_component > 0,
        rp["vel_direction_component_reward_magnitude"] * vel_dir_component
        * reasonable_vel,
        -0.2 * jnp.ones_like(vel_dir_component),
    ) * jnp.minimum(dist / 3.0, 1.0)

    vel_mag_penalty = _epf(2.0, 2.0, jnp.clip(vel_norm - 3.0, 0.0, None))
    close_to_goal = 1.0 - _erf(1.0, 2.0, dist)
    neg_x_vel_penalty = _epf(2.0, 8.0,
                             jnp.clip(vehicle_linvel[..., 0], 0.0, None)) \
        * close_to_goal
    vel_penalty = vel_mag_penalty + neg_x_vel_penalty

    low_vel_reward = _erf(1.5, 10.0, vel_norm) + _erf(1.5, 0.5, vel_norm)
    correct_yaw_reward = _erf(2.0, 0.2, yaw_error) + _erf(4.0, 15.0, yaw_error)
    alignment_factor = _erf(1.0, 2.0, yaw_error)
    low_angvel_reward = _erf(1.5, 5.0, body_angvel[..., 2]) * alignment_factor
    stable_at_goal = jnp.where(
        dist < 1.0, low_vel_reward + correct_yaw_reward + low_angvel_reward, 0.0)

    dist_from_goal_reward = (20.0 - dist) / 20.0

    ad = action - prev_action
    diff_pen = (_epf(rp["x_action_diff_penalty_magnitude"],
                     rp["x_action_diff_penalty_exponent"], ad[..., 0])
                + _epf(rp["y_action_diff_penalty_magnitude"],
                       rp["y_action_diff_penalty_exponent"], ad[..., 1])
                + _epf(rp["z_action_diff_penalty_magnitude"],
                       rp["z_action_diff_penalty_exponent"], ad[..., 2])
                + _epf(rp["yawrate_action_diff_penalty_magnitude"],
                       rp["yawrate_action_diff_penalty_exponent"], ad[..., 3]))
    abs_pen = curriculum_progress * (
        _epf(rp["x_absolute_action_penalty_magnitude"],
             rp["x_absolute_action_penalty_exponent"], action[..., 0])
        + _epf(rp["y_absolute_action_penalty_magnitude"],
               rp["y_absolute_action_penalty_exponent"], action[..., 1])
        + _epf(rp["z_absolute_action_penalty_magnitude"],
               rp["z_absolute_action_penalty_exponent"], action[..., 2])
        + _epf(rp["yawrate_absolute_action_penalty_magnitude"],
               rp["yawrate_absolute_action_penalty_exponent"], action[..., 3]))

    ttc_penalty = _erf(-3.0, 2.0, ttc * ttc)

    reward = mult * (pos_reward + very_close * alignment_factor
                     + vel_dir_reward + dist_from_goal_reward + stable_at_goal
                     + vel_penalty + diff_pen + abs_pen + ttc_penalty)
    reward = jnp.where(crashes > 0, rp["collision_penalty"], reward)
    return reward


def sample_targets(cfg: LidarNavigationTaskConfig, sim: SimState, key):
    N = sim.pos.shape[0]
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (N, 3), jnp.float32)
    ratio = jnp.asarray(cfg.target_min_ratio) + (
        jnp.asarray(cfg.target_max_ratio) - jnp.asarray(cfg.target_min_ratio)) * u
    target = interpolate_ratio(sim.bounds_lo, sim.bounds_hi, ratio)
    yaw = jax.random.uniform(k2, (N,), jnp.float32, -np.pi, np.pi)
    return target, yaw


def make_lidar_nav_step(params: SimParams, cfg: LidarNavigationTaskConfig):
    cur = cfg.curriculum
    rp = cfg.reward_parameters

    def step(ns: LidarNavState, raw_actions: jax.Array):
        key, k_obs, k_tgt, k_noise, k_pc = jax.random.split(ns.key, 5)
        action = action_transform(cfg, raw_actions)
        sim = dynamics.env_step(params, ns.sim, action, None)

        obs = compute_robot_obs(sim.pos, sim.quat, sim.linvel, sim.angvel)
        pos_error = quat_apply_inverse(obs.vehicle_quat,
                                       ns.target_position - obs.pos)
        yaw_error = ssa(ns.target_yaw - obs.euler[..., 2])
        progress = (ns.curriculum_level - cur.min_level) / max(
            cur.max_level - cur.min_level, 1)
        reward = compute_reward(rp, pos_error, ns.pos_error_prev,
                                obs.vehicle_linvel, obs.body_angvel, yaw_error,
                                sim.crashes, action, ns.prev_action, ns.ttc,
                                progress)
        crashes = sim.crashes
        truncations = (sim.sim_steps > cfg.episode_len_steps).astype(jnp.float32)
        dist = safe_norm(ns.target_position - obs.pos, axis=-1)
        successes = truncations * (dist < cfg.success_distance).astype(jnp.float32)
        successes = jnp.where(crashes > 0, 0.0, successes)
        timeouts = jnp.where(crashes > 0, 0.0, truncations * (1.0 - successes))

        # curriculum aggregation (shared with the camera nav task)
        level, s_agg, c_agg, t_agg = curriculum_update(
            cur, ns.curriculum_level, ns.success_agg, ns.crash_agg,
            ns.timeout_agg, successes, crashes, timeouts)

        sim = sim.replace(
            crashes=crashes, truncations=truncations,
            num_obstacles=jnp.full_like(sim.num_obstacles,
                                        level.astype(jnp.int32)))
        done = jnp.maximum(crashes, truncations)
        sim = dynamics.reset_envs(params, sim, done)

        fresh_target, fresh_yaw = sample_targets(cfg, sim, k_tgt)
        target = jnp.where(done.astype(bool)[:, None], fresh_target,
                           ns.target_position)
        target_yaw = jnp.where(done.astype(bool), fresh_yaw, ns.target_yaw)

        # render AFTER the reset; pointcloud processing + TTC
        obs2 = compute_robot_obs(sim.pos, sim.quat, sim.linvel, sim.angvel)
        # range-image consumer only: skip in-kernel segmentation work
        pts, _ = render_lidar(params, sim, noise_key=k_noise, want_seg=False)
        env_steps = ns.env_steps + float(ns.sim.pos.shape[0])
        if cfg.radar_mode and cfg.radar_invalid_anneal_env_steps > 0:
            frac = jnp.clip(
                env_steps / float(cfg.radar_invalid_anneal_env_steps),
                0.0, 1.0)
            invalid_prob = (cfg.radar_invalid_prob_start
                            + (cfg.radar_invalid_prob
                               - cfg.radar_invalid_prob_start) * frac)
        else:
            invalid_prob = None
        lidar_obs, ttc = process_pointcloud(cfg, obs2.pos, obs2.linvel, pts,
                                            k_pc, invalid_prob)

        if cfg.return_state_before_reset:
            # reference lidar_navigation_task.py:386 True path: obs from
            # the PRE-reset state, with the previous step's lidar features
            # (the reference renders after reset, so the returned image is
            # one step stale at that point)
            pack_obs, pack_target, pack_yaw = obs, ns.target_position, ns.target_yaw
            pack_lidar = ns.lidar_obs
        else:
            pack_obs, pack_target, pack_yaw = obs2, target, target_yaw
            pack_lidar = lidar_obs
        vec_to_tgt = quat_apply_inverse(pack_obs.vehicle_quat,
                                        pack_target - pack_obs.pos)
        dist_to_tgt = safe_norm(vec_to_tgt, axis=-1, keepdims=True)
        perturb = 0.2 * (jax.random.uniform(k_obs, vec_to_tgt.shape) - 0.5)
        unit_vec = (vec_to_tgt + perturb) / jnp.maximum(dist_to_tgt, 1e-6)
        euler = ssa(pack_obs.euler)
        e_pert = euler + 0.1 * (jax.random.uniform(
            jax.random.fold_in(k_obs, 1), euler.shape) - 0.5)
        task_obs = jnp.concatenate([
            unit_vec, dist_to_tgt,
            e_pert[..., 0:1], e_pert[..., 1:2],
            ssa(pack_yaw - euler[..., 2])[..., None],
            pack_obs.body_linvel, pack_obs.body_angvel,
            action,
            pack_lidar,
        ], axis=-1)

        pos_error_new = quat_apply_inverse(obs2.vehicle_quat, target - obs2.pos)
        ns = LidarNavState(
            sim=sim, target_position=target, target_yaw=target_yaw,
            pos_error_prev=pos_error_new,
            # reference zeroes robot_prev_actions on reset (reset_idx)
            prev_action=jnp.where(done.astype(bool)[:, None], 0.0, action),
            lidar_obs=lidar_obs, ttc=ttc, env_steps=env_steps, key=key,
            curriculum_level=level,
            success_agg=s_agg, crash_agg=c_agg, timeout_agg=t_agg)
        infos = {"successes": successes, "timeouts": timeouts,
                 "crashes": crashes, "curriculum_level": level}
        return ns, task_obs, reward, crashes, truncations, infos

    return step


class LiDARNavigationTask:
    def __init__(self, task_config: LidarNavigationTaskConfig, seed=None,
                 num_envs=None, headless=None, device=None, use_warp=None):
        if seed is not None:
            task_config.seed = seed
        if num_envs is not None:
            task_config.num_envs = num_envs
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
        if self.params.lidar is None:
            raise ValueError(
                f"robot '{task_config.robot_name}' has no lidar sensor")
        cfg = task_config
        if self.params.scene is not None:
            cfg.curriculum.max_level = min(cfg.curriculum.max_level,
                                           self.params.scene.num_assets)

        self._step = jax.jit(make_lidar_nav_step(self.params, cfg),
                             donate_argnums=(0,))
        self.nav_state = self._initial_state()
        self.observation_space_dim = cfg.observation_space_dim
        self.action_space_dim = cfg.action_space_dim
        self.infos: Dict = {}
        self.task_obs = {"observations": jnp.zeros(
            (self.num_envs, cfg.observation_space_dim), jnp.float32)}
        self.rewards = jnp.zeros((self.num_envs,), jnp.float32)
        self.terminations = jnp.zeros((self.num_envs,), jnp.float32)
        self.truncations = jnp.zeros((self.num_envs,), jnp.float32)

    def _initial_state(self) -> LidarNavState:
        cfg = self.task_config
        sim = self.sim_env.state
        sim = sim.replace(num_obstacles=jnp.full(
            (self.num_envs,), cfg.curriculum.min_level, jnp.int32))
        key = jax.random.PRNGKey(cfg.seed + 1337)
        key, k_tgt = jax.random.split(key)
        target, yaw = sample_targets(cfg, sim, k_tgt)
        D = cfg.observation_space_dim - 17
        return LidarNavState(
            sim=sim, target_position=target, target_yaw=yaw,
            pos_error_prev=jnp.zeros((self.num_envs, 3), jnp.float32),
            prev_action=jnp.zeros((self.num_envs, 4), jnp.float32),
            lidar_obs=jnp.zeros((self.num_envs, D), jnp.float32),
            ttc=jnp.full((self.num_envs,), 10.0, jnp.float32),
            env_steps=jnp.zeros((), jnp.float32),
            key=key,
            curriculum_level=jnp.full((), float(cfg.curriculum.min_level),
                                      jnp.float32),
            success_agg=jnp.zeros((), jnp.float32),
            crash_agg=jnp.zeros((), jnp.float32),
            timeout_agg=jnp.zeros((), jnp.float32),
        )

    @property
    def state(self):
        return self.nav_state.sim

    def close(self):
        self.sim_env.delete_env()

    def reset(self):
        self.sim_env.reset()
        self.nav_state = self.nav_state.replace(sim=self.sim_env.state)
        return self.get_return_tuple()

    def reset_idx(self, env_ids):
        self.sim_env.reset_idx(env_ids)
        self.nav_state = self.nav_state.replace(sim=self.sim_env.state)

    def render(self):
        return None

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32)
        (self.nav_state, task_obs, reward, term, trunc,
         infos) = self._step(self.nav_state, actions)
        self.sim_env.state = self.nav_state.sim
        self.task_obs["observations"] = task_obs
        self.rewards, self.terminations, self.truncations = reward, term, trunc
        self.infos = infos
        return self.get_return_tuple()

    def get_return_tuple(self):
        return (self.task_obs, self.rewards, self.terminations,
                self.truncations, self.infos)

    def make_step_fn(self):
        step = make_lidar_nav_step(self.params, self.task_config)

        def step_fn(ns, action):
            ns, obs, reward, term, trunc, _ = step(ns, action)
            return ns, obs, reward, term, trunc

        zero_obs = jnp.zeros(
            (self.num_envs, self.task_config.observation_space_dim), jnp.float32)
        return step_fn, self.nav_state, zero_obs

    def set_carry(self, carry):
        self.nav_state = carry
        self.sim_env.state = carry.sim


class RadarNavigationTask(LiDARNavigationTask):
    """reference radar_navigation_task.py — same skeleton, fake-radar cone
    sensor on lmf2_radar with sparse invalid returns."""
