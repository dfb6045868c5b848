"""Navigation task — depth-camera obstacle navigation with VAE perception.

Parity with reference task/navigation_task/navigation_task.py:
  * obs = 17 state dims + 64 VAE latents (perturbed unit vector to goal,
    distance, perturbed roll/pitch, body velocities, previous transformed
    action; navigation_task.py:369-395),
  * velocity-setpoint action transform with inclination model
    (navigation_task_config.py:88-122),
  * reward: exponential position + very-close + progress ("getting closer")
    + action difference/absolute penalties, collision -100
    (navigation_task.py:435-521),
  * success/crash/timeout accounting + obstacle-count curriculum
    (:234-273) — here computed fully in-graph (device-side aggregates,
    no host round trip),
  * camera rendered AFTER the auto-reset so the returned observation
    reflects the fresh state (:355-357).

Differences (documented): targets are re-sampled for auto-reset envs inside
the fused step (the reference only re-samples on explicit task reset).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..sim import dynamics
from ..sim.sim_builder import SimBuilder
from ..sim.structs import SimParams, SimState
from ..control.controllers import compute_robot_obs
from ..models.vae import VAEImageEncoder
from ..sensors.raycast_sensor import render_camera
from ..utils import rng as rnglib
from ..utils.math import interpolate_ratio, quat_apply_inverse, safe_norm, ssa
from ..utils.logging import CustomLogger

logger = CustomLogger("navigation_task")


@dataclass
class CurriculumConfig:
    min_level: int = 15
    # reference navigation_task_config.py:64 (capped at the built obstacle
    # count at construction, see NavigationTask.__init__)
    max_level: int = 50
    check_after_log_instances: int = 2048
    increase_step: int = 2
    decrease_step: int = 1
    success_rate_for_increase: float = 0.7
    success_rate_for_decrease: float = 0.6


@dataclass
class NavigationTaskConfig:
    seed: int = 1
    sim_name: str = "base_sim"
    env_name: str = "env_with_obstacles"
    # reference navigation_task_config.py: the lmf2 platform (which carries
    # the depth camera, lmf2_config.py:54) with its velocity controller
    robot_name: str = "lmf2"
    controller_name: str = "lmf2_velocity_control"
    args: dict = field(default_factory=dict)
    num_envs: int = 1024
    use_warp: bool = True
    headless: bool = True
    device: str = "tpu"
    observation_space_dim: int = 13 + 4 + 64
    privileged_observation_space_dim: int = 0
    action_space_dim: int = 4
    episode_len_steps: int = 100
    return_state_before_reset: bool = False
    target_min_ratio: Tuple[float, float, float] = (0.90, 0.1, 0.1)
    target_max_ratio: Tuple[float, float, float] = (0.94, 0.90, 0.90)
    max_speed: float = 2.0
    max_yawrate: float = np.pi / 3.0
    max_inclination_angle: float = np.pi / 4.0
    success_distance: float = 1.0
    latent_dim: int = 64
    use_vae: bool = True
    vae_params_path: Optional[str] = None
    # .pth from the reference framework's torch VAE (utils/vae/VAE.py) —
    # imported via models/torch_vae_import; takes precedence over
    # vae_params_path when set
    torch_vae_path: Optional[str] = None
    curriculum: CurriculumConfig = field(default_factory=CurriculumConfig)
    reward_parameters: dict = field(default_factory=lambda: {
        "pos_reward_magnitude": 5.0,
        "pos_reward_exponent": 1.0 / 3.5,
        "very_close_to_goal_reward_magnitude": 5.0,
        "very_close_to_goal_reward_exponent": 2.0,
        "getting_closer_reward_multiplier": 10.0,
        "x_action_diff_penalty_magnitude": 0.8,
        "x_action_diff_penalty_exponent": 3.333,
        "z_action_diff_penalty_magnitude": 0.8,
        "z_action_diff_penalty_exponent": 5.0,
        "yawrate_action_diff_penalty_magnitude": 0.8,
        "yawrate_action_diff_penalty_exponent": 3.33,
        "x_absolute_action_penalty_magnitude": 0.1,
        "x_absolute_action_penalty_exponent": 0.3,
        "z_absolute_action_penalty_magnitude": 1.5,
        "z_absolute_action_penalty_exponent": 1.0,
        "yawrate_absolute_action_penalty_magnitude": 1.5,
        "yawrate_absolute_action_penalty_exponent": 2.0,
        "collision_penalty": -100.0,
    })


@struct.dataclass
class NavState:
    sim: SimState
    target_position: jax.Array       # (N, 3)
    pos_error_prev: jax.Array        # (N, 3) vehicle-frame
    prev_action: jax.Array           # (N, 4) transformed
    latents: jax.Array               # (N, latent_dim)
    key: jax.Array                   # task-level PRNG key (2,)
    curriculum_level: jax.Array      # scalar f32
    success_agg: jax.Array           # scalar f32
    crash_agg: jax.Array
    timeout_agg: jax.Array


def action_transform(cfg: NavigationTaskConfig, raw):
    """reference navigation_task_config.action_transformation_function."""
    a = jnp.clip(raw, -1.0, 1.0)
    a0 = a[..., 0] + 1.0
    vx = a0 * jnp.cos(cfg.max_inclination_angle * a[..., 1]) * cfg.max_speed / 2.0
    vz = a0 * jnp.sin(cfg.max_inclination_angle * a[..., 1]) * cfg.max_speed / 2.0
    yaw_rate = a[..., 2] * cfg.max_yawrate
    return jnp.stack([vx, jnp.zeros_like(vx), vz, yaw_rate], axis=-1)


def _exp_reward(mag, exp, v):
    return mag * jnp.exp(-(v * v) * exp)


def _exp_penalty(mag, exp, v):
    return mag * (jnp.exp(-(v * v) * exp) - 1.0)


def compute_reward(rp: dict, pos_error, prev_pos_error, crashes, action,
                   prev_action, curriculum_progress: jax.Array):
    mult = 1.0 + 2.0 * curriculum_progress
    dist = safe_norm(pos_error, axis=-1)
    prev_dist = safe_norm(prev_pos_error, axis=-1)
    pos_reward = _exp_reward(rp["pos_reward_magnitude"],
                             rp["pos_reward_exponent"], dist)
    very_close = _exp_reward(rp["very_close_to_goal_reward_magnitude"],
                             rp["very_close_to_goal_reward_exponent"], dist)
    closer = prev_dist - dist
    closer_reward = jnp.where(closer > 0,
                              rp["getting_closer_reward_multiplier"] * closer,
                              2.0 * rp["getting_closer_reward_multiplier"] * closer)
    dist_reward = (20.0 - dist) / 20.0
    ad = action - prev_action
    diff_pen = (_exp_penalty(rp["x_action_diff_penalty_magnitude"],
                             rp["x_action_diff_penalty_exponent"], ad[..., 0])
                + _exp_penalty(rp["z_action_diff_penalty_magnitude"],
                               rp["z_action_diff_penalty_exponent"], ad[..., 2])
                + _exp_penalty(rp["yawrate_action_diff_penalty_magnitude"],
                               rp["yawrate_action_diff_penalty_exponent"], ad[..., 3]))
    abs_pen = curriculum_progress * (
        _exp_penalty(rp["x_absolute_action_penalty_magnitude"],
                     rp["x_absolute_action_penalty_exponent"], action[..., 0])
        + _exp_penalty(rp["z_absolute_action_penalty_magnitude"],
                       rp["z_absolute_action_penalty_exponent"], action[..., 2])
        + _exp_penalty(rp["yawrate_absolute_action_penalty_magnitude"],
                       rp["yawrate_absolute_action_penalty_exponent"], action[..., 3]))
    reward = mult * (pos_reward + very_close + closer_reward + dist_reward) \
        + diff_pen + abs_pen
    reward = jnp.where(crashes > 0, rp["collision_penalty"], reward)
    return reward



def curriculum_update(cur: CurriculumConfig, level, s_agg, c_agg, t_agg,
                      successes, crashes, timeouts):
    """In-graph curriculum (reference check_and_update_curriculum_level):
    accumulate success/crash/timeout counts; once enough episode outcomes
    are logged, raise/lower the obstacle-count level by the success rate
    and reset the aggregates. Pure; shared by the camera and lidar tasks."""
    s_agg = s_agg + successes.sum()
    c_agg = c_agg + crashes.sum()
    t_agg = t_agg + timeouts.sum()
    instances = s_agg + c_agg + t_agg
    do_update = instances >= cur.check_after_log_instances
    success_rate = s_agg / jnp.maximum(instances, 1.0)
    new_level = jnp.where(success_rate > cur.success_rate_for_increase,
                          level + cur.increase_step,
                          jnp.where(success_rate < cur.success_rate_for_decrease,
                                    level - cur.decrease_step, level))
    new_level = jnp.clip(new_level, cur.min_level, cur.max_level)
    level = jnp.where(do_update, new_level, level)
    s_agg = jnp.where(do_update, 0.0, s_agg)
    c_agg = jnp.where(do_update, 0.0, c_agg)
    t_agg = jnp.where(do_update, 0.0, t_agg)
    return level, s_agg, c_agg, t_agg


def sample_targets(cfg: NavigationTaskConfig, sim: SimState, key):
    N = sim.pos.shape[0]
    u = jax.random.uniform(key, (N, 3), jnp.float32)
    ratio = jnp.asarray(cfg.target_min_ratio) + (
        jnp.asarray(cfg.target_max_ratio) - jnp.asarray(cfg.target_min_ratio)) * u
    return interpolate_ratio(sim.bounds_lo, sim.bounds_hi, ratio)


def make_nav_step(params: SimParams, cfg: NavigationTaskConfig, vae: Optional[VAEImageEncoder]):
    cur = cfg.curriculum
    rp = cfg.reward_parameters

    def nav_step(ns: NavState, raw_actions: jax.Array):
        key, k_obs, k_tgt, k_noise, k_lat = jax.random.split(ns.key, 5)
        action = action_transform(cfg, raw_actions)
        sim = dynamics.env_step(params, ns.sim, action, None)

        obs = compute_robot_obs(sim.pos, sim.quat, sim.linvel, sim.angvel)
        pos_error = quat_apply_inverse(obs.vehicle_quat,
                                       ns.target_position - obs.pos)
        progress = (ns.curriculum_level - cur.min_level) / max(
            cur.max_level - cur.min_level, 1)
        reward = compute_reward(rp, pos_error, ns.pos_error_prev, sim.crashes,
                                action, ns.prev_action, progress)
        crashes = sim.crashes
        truncations = (sim.sim_steps > cfg.episode_len_steps).astype(jnp.float32)
        dist = safe_norm(ns.target_position - obs.pos, axis=-1)
        successes = truncations * (dist < cfg.success_distance).astype(jnp.float32)
        successes = jnp.where(crashes > 0, 0.0, successes)
        timeouts = jnp.where(crashes > 0, 0.0,
                             truncations * (1.0 - successes))

        # ---- in-graph curriculum (reference check_and_update_curriculum) --
        level, s_agg, c_agg, t_agg = curriculum_update(
            cur, ns.curriculum_level, ns.success_agg, ns.crash_agg,
            ns.timeout_agg, successes, crashes, timeouts)

        # ---- auto-reset with curriculum-sized obstacle count --------------
        sim = sim.replace(
            crashes=crashes, truncations=truncations,
            num_obstacles=jnp.full_like(sim.num_obstacles, level.astype(jnp.int32)))
        done = jnp.maximum(crashes, truncations)
        sim = dynamics.reset_envs(params, sim, done)

        # re-sample targets for reset envs (inside fresh bounds)
        fresh_targets = sample_targets(cfg, sim, k_tgt)
        target = jnp.where(done.astype(bool)[:, None], fresh_targets,
                           ns.target_position)

        # ---- render AFTER reset + perception -------------------------------
        obs2 = compute_robot_obs(sim.pos, sim.quat, sim.linvel, sim.angvel)
        if params.camera is not None:
            # depth-only consumer: skip in-kernel segmentation work
            pixels, _seg = render_camera(params, sim, noise_key=k_noise,
                                         want_seg=False)
            if vae is not None:
                latents = vae.encode(pixels, key=k_lat)
            else:
                # fallback: min-pooled inverse-depth features
                B = pixels.shape[0]
                small = -jax.lax.reduce_window(
                    -pixels, -jnp.inf, jax.lax.max,
                    (1, pixels.shape[1] // 8, pixels.shape[2] // 8),
                    (1, pixels.shape[1] // 8, pixels.shape[2] // 8), "VALID")
                latents = small.reshape(B, -1)[:, :cfg.latent_dim]
        else:
            pixels = None
            latents = jnp.zeros_like(ns.latents)

        # ---- observation packing (reference process_obs_for_task) ---------
        if cfg.return_state_before_reset:
            # reference navigation_task.py:309 True path: the returned obs
            # reflect the PRE-reset state and the latents rendered for the
            # previous step (the reference renders after reset, so at
            # return time self.image_latents is one step stale)
            pack_obs, pack_target, pack_latents = obs, ns.target_position, ns.latents
        else:
            pack_obs, pack_target, pack_latents = obs2, target, latents
        vec_to_tgt = quat_apply_inverse(pack_obs.vehicle_quat,
                                        pack_target - pack_obs.pos)
        dist_to_tgt = safe_norm(vec_to_tgt, axis=-1, keepdims=True)
        perturb = 0.2 * (jax.random.uniform(k_obs, vec_to_tgt.shape) - 0.5)
        unit_vec = (vec_to_tgt + perturb) / jnp.maximum(dist_to_tgt, 1e-6)
        euler = ssa(pack_obs.euler)
        e_pert = euler + 0.1 * (jax.random.uniform(
            jax.random.fold_in(k_obs, 1), euler.shape) - 0.5)
        task_obs = jnp.concatenate([
            unit_vec,
            dist_to_tgt,
            e_pert[..., 0:1], e_pert[..., 1:2],
            jnp.zeros_like(dist_to_tgt),
            pack_obs.body_linvel, pack_obs.body_angvel,
            action,
            pack_latents,
        ], axis=-1)

        pos_error_new = quat_apply_inverse(obs2.vehicle_quat, target - obs2.pos)
        ns = NavState(
            sim=sim, target_position=target, pos_error_prev=pos_error_new,
            prev_action=jnp.where(done.astype(bool)[:, None], 0.0, action),
            latents=latents, key=key,
            curriculum_level=level, success_agg=s_agg, crash_agg=c_agg,
            timeout_agg=t_agg)
        infos = {"successes": successes, "timeouts": timeouts,
                 "crashes": crashes, "curriculum_level": level}
        return ns, task_obs, reward, crashes, truncations, infos

    return nav_step


class NavigationTask:
    def __init__(self, task_config: NavigationTaskConfig, seed=None,
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
        cfg = task_config
        # cap curriculum at the actual number of obstacle slots
        if self.params.scene is not None:
            cfg.curriculum.max_level = min(cfg.curriculum.max_level,
                                           self.params.scene.num_assets)

        self.vae = None
        if cfg.use_vae and self.params.camera is not None:
            if getattr(cfg, "torch_vae_path", None):
                # weights trained in the reference framework (torch)
                from ..models.torch_vae_import import TorchVAEImageEncoder
                self.vae = TorchVAEImageEncoder(
                    cfg.torch_vae_path, latent_dim=cfg.latent_dim)
            else:
                vae_params, arch = None, "conv"
                if cfg.vae_params_path:
                    import pickle
                    with open(cfg.vae_params_path, "rb") as f:
                        loaded = pickle.load(f)
                    # train_vae --arch vit wraps params with an arch tag;
                    # plain conv-VAE pickles are the raw params tree
                    if isinstance(loaded, dict) and loaded.get("arch") == "vit":
                        arch, vae_params = "vit", loaded["params"]
                        # attn_impl rides the tag too: a flash-trained
                        # large encoder also INFERS through the fused
                        # kernel (checkpoints are impl-interchangeable,
                        # models/vit.py FusedAttention)
                        vit_kw = {k: loaded[k] for k in
                                  ("patch", "dim", "depth", "num_heads",
                                   "attn_impl")
                                  if k in loaded}
                    else:
                        vae_params = loaded
                image_res = (self.params.camera.height,
                             self.params.camera.width)
                if arch == "vit":
                    from ..models.vit import ViTImageEncoder
                    self.vae = ViTImageEncoder(latent_dim=cfg.latent_dim,
                                               image_res=image_res,
                                               params=vae_params,
                                               seed=cfg.seed, **vit_kw)
                else:
                    self.vae = VAEImageEncoder(latent_dim=cfg.latent_dim,
                                               image_res=image_res,
                                               params=vae_params,
                                               seed=cfg.seed)

        self._nav_step = jax.jit(make_nav_step(self.params, cfg, self.vae),
                                 donate_argnums=(0,))
        self.nav_state = self._initial_nav_state()
        self.observation_space_dim = cfg.observation_space_dim
        self.action_space_dim = cfg.action_space_dim
        self.infos: Dict = {}
        self.task_obs = {"observations": jnp.zeros(
            (self.num_envs, cfg.observation_space_dim), jnp.float32)}
        self.rewards = jnp.zeros((self.num_envs,), jnp.float32)
        self.terminations = jnp.zeros((self.num_envs,), jnp.float32)
        self.truncations = jnp.zeros((self.num_envs,), jnp.float32)

    def _initial_nav_state(self) -> NavState:
        cfg = self.task_config
        sim = self.sim_env.state
        sim = sim.replace(num_obstacles=jnp.full(
            (self.num_envs,), cfg.curriculum.min_level, jnp.int32))
        key = jax.random.PRNGKey(cfg.seed + 777)
        key, k_tgt = jax.random.split(key)
        target = sample_targets(cfg, sim, k_tgt)
        return NavState(
            sim=sim,
            target_position=target,
            pos_error_prev=jnp.zeros((self.num_envs, 3), jnp.float32),
            prev_action=jnp.zeros((self.num_envs, 4), jnp.float32),
            latents=jnp.zeros((self.num_envs, cfg.latent_dim), jnp.float32),
            key=key,
            # strongly-typed scalars: weak-typed literals would retrace the
            # donated jit on the second call
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
        # one no-op-ish step to populate obs/latents from a real render
        return self.get_return_tuple()

    def reset_idx(self, env_ids):
        self.sim_env.reset_idx(env_ids)
        self.nav_state = self.nav_state.replace(sim=self.sim_env.state)

    def render(self):
        return None

    def step(self, actions):
        actions = jnp.asarray(actions, jnp.float32)
        (self.nav_state, task_obs, reward, term, trunc,
         infos) = self._nav_step(self.nav_state, actions)
        self.sim_env.state = self.nav_state.sim
        self.task_obs["observations"] = task_obs
        self.rewards, self.terminations, self.truncations = reward, term, trunc
        self.infos = infos
        return self.get_return_tuple()

    def get_return_tuple(self):
        return (self.task_obs, self.rewards, self.terminations,
                self.truncations, self.infos)

    def make_step_fn(self):
        """PPO protocol: (step_fn, init_carry, init_obs)."""
        nav_step = make_nav_step(self.params, self.task_config, self.vae)

        def step_fn(ns, action):
            ns, obs, reward, term, trunc, _infos = nav_step(ns, action)
            return ns, obs, reward, term, trunc

        zero_obs = jnp.zeros(
            (self.num_envs, self.task_config.observation_space_dim), jnp.float32)
        return step_fn, self.nav_state, zero_obs

    def set_carry(self, carry):
        self.nav_state = carry
        self.sim_env.state = carry.sim
