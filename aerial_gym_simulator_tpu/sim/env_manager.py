"""Stateful host-side facade over the functional sim core.

API parity with the reference's EnvManager (env_manager/env_manager.py):
``step(actions, env_actions)``, ``reset()``, ``reset_idx(env_ids)``,
``get_obs()``, ``post_reward_calculation_step()``. Internally everything is
one jitted pure function with the state pytree donated each call, so the
steady state allocates nothing and runs as a single fused TPU program.

RL tasks do NOT have to go through this class — they compose the functional
pieces into their own fully fused step (tasks/*). This facade exists for
examples, interactive use, and API-compatible benchmarking.
"""

from __future__ import annotations

import math
import random as pyrandom
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..control.controllers import compute_robot_obs
from ..utils.logging import CustomLogger
from . import dynamics
from .structs import SimParams, SimState
from .params import initial_state

logger = CustomLogger("env_manager")


@partial(jax.jit, static_argnums=0, donate_argnums=2)
def _jit_env_step(params_static, params, state, actions, n_substeps):
    del params_static
    return dynamics.env_step(params, state, actions, n_substeps)


@partial(jax.jit, static_argnums=0, donate_argnums=2)
def _jit_reset(params_static, params, state, mask):
    del params_static
    return dynamics.reset_envs(params, state, mask)


@partial(jax.jit, static_argnums=0, donate_argnums=2)
def _jit_post_reward(params_static, params, state, crashes, truncations):
    del params_static
    state = state.replace(crashes=crashes, truncations=truncations)
    return dynamics.post_reward_step(params, state)


@partial(jax.jit, static_argnums=0)
def _jit_obs(params_static, state):
    del params_static
    obs = compute_robot_obs(state.pos, state.quat, state.linvel, state.angvel)
    return {
        "robot_position": obs.pos,
        "robot_orientation": obs.quat,
        "robot_linvel": obs.linvel,
        "robot_angvel": obs.angvel,
        "robot_euler_angles": obs.euler,
        "robot_vehicle_orientation": obs.vehicle_quat,
        "robot_vehicle_linvel": obs.vehicle_linvel,
        "robot_body_linvel": obs.body_linvel,
        "robot_body_angvel": obs.body_angvel,
        "robot_actions": None,
        "crashes": state.crashes,
        "truncations": state.truncations,
        "motor_thrusts": state.motor_thrust,
        "imu_measurement": jnp.concatenate(
            [state.applied_force_b, state.applied_torque_b], axis=-1),
        "obstacle_position": state.obstacle_pos,
        "obstacle_orientation": state.obstacle_quat,
    }


class _RobotHandle:
    """Reference-parity robot surface (env_manager.robot_manager.robot.*).

    The reference drives reconfigurable robots outside the task API via
    ``robot.set_dof_velocity_targets`` (examples/
    shape_control_example_reconfigurable.py:41, base_reconfigurable.py);
    here the targets live in SimState, so the setters replace the pytree
    leaves functionally."""

    def __init__(self, env_manager: "EnvManager"):
        self._em = env_manager

    def set_dof_position_targets(self, targets):
        em = self._em
        em.state = em.state.replace(
            dof_pos_target=jnp.broadcast_to(
                jnp.asarray(targets, jnp.float32),
                em.state.dof_pos_target.shape))

    def set_dof_velocity_targets(self, targets):
        em = self._em
        em.state = em.state.replace(
            dof_vel_target=jnp.broadcast_to(
                jnp.asarray(targets, jnp.float32),
                em.state.dof_vel_target.shape))


class _RobotManagerHandle:
    """Matches the reference attribute chain env_manager.robot_manager.robot
    (robot_manager.py:21); the TPU build has no manager object web, so this
    is a thin view over EnvManager state."""

    def __init__(self, env_manager: "EnvManager"):
        self.robot = _RobotHandle(env_manager)


class EnvManager:
    """Owns (params, state) and the compiled step/reset programs."""

    def __init__(self, params: SimParams, seed: int = 0, sim_config=None,
                 env_config=None, robot_config=None, controller_config=None):
        self.params = params
        self.sim_config = sim_config
        self.env_config = env_config
        self.robot_config = robot_config
        self.controller_config = controller_config
        self.num_envs = params.env.num_envs
        self.num_robot_actions = params.controller.num_actions
        self.num_env_actions = params.env.num_env_actions
        self.state: SimState = initial_state(params, seed=seed)
        self.step_counter = 0
        self._params_key = id(params)  # static jit key; params never mutate
        self._py_rng = pyrandom.Random(seed)
        # env_actions buffer (dynamic obstacle twists)
        self.env_actions = None
        # latest sensor capture (filled by render(); reference
        # global_tensor_dict["depth_range_pixels"] / "segmentation_pixels")
        self._sensor_frames = None
        self._sensor_seg = None
        self._lidar_frames = None
        self._lidar_seg = None
        self._rgb_frames = None
        self._jit_render = None
        self._jit_render_rgb = None
        self._render_key = None
        self.robot_manager = _RobotManagerHandle(self)
        self.reset()

    # -- core loop ---------------------------------------------------------

    def _sample_substeps(self) -> int:
        env = self.params.env
        if env.substep_std == 0.0:
            return env.substep_mean
        return max(int(math.floor(self._py_rng.gauss(env.substep_mean,
                                                     env.substep_std))), 0)

    def step(self, actions, env_actions=None):
        actions = jnp.asarray(actions, dtype=jnp.float32)
        if env_actions is not None:
            self.env_actions = jnp.asarray(env_actions, dtype=jnp.float32)
            if self.params.scene is not None and self.params.scene.num_assets > 0:
                from ..envs.scene import apply_env_actions
                self.state = apply_env_actions(self.params, self.state,
                                               self.env_actions)
        n = jnp.int32(self._sample_substeps())
        self.state = _jit_env_step(self._params_key, self.params, self.state,
                                   actions, n)
        self.step_counter += 1
        return self.state

    def reset(self):
        mask = jnp.ones((self.num_envs,), dtype=jnp.float32)
        self.state = _jit_reset(self._params_key, self.params, self.state, mask)
        return self.get_obs()

    def reset_idx(self, env_ids):
        mask = jnp.zeros((self.num_envs,), dtype=jnp.float32)
        mask = mask.at[jnp.asarray(env_ids)].set(1.0)
        self.state = _jit_reset(self._params_key, self.params, self.state, mask)

    def post_reward_calculation_step(self, crashes=None, truncations=None):
        """Auto-reset done envs. The task passes its updated crash/truncation
        verdicts (functional replacement for the reference's in-place
        mutation of obs_dict['crashes'])."""
        crashes = self.state.crashes if crashes is None else crashes
        truncations = self.state.truncations if truncations is None else truncations
        self.state = _jit_post_reward(self._params_key, self.params, self.state,
                                      crashes, truncations)

    # -- observation access --------------------------------------------------

    def get_obs(self) -> Dict[str, jax.Array]:
        obs = dict(_jit_obs(self._params_key, self.state))
        obs["num_envs"] = self.num_envs
        obs["gravity"] = self.params.gravity
        obs["robot_mass"] = self.params.robot.mass
        obs["robot_inertia"] = self.params.robot.inertia
        # reference global_tensor_dict parity keys
        obs["env_bounds_min"] = self.state.bounds_lo
        obs["env_bounds_max"] = self.state.bounds_hi
        obs["num_obstacles_in_env"] = self.state.num_obstacles
        if self._sensor_frames is not None:
            obs["depth_range_pixels"] = self._sensor_frames
        if self._sensor_seg is not None:
            obs["segmentation_pixels"] = self._sensor_seg
        if self._lidar_frames is not None:
            # camera+lidar simultaneously enabled: the lidar scan rides its
            # own keys (the reference FORBIDS this combination outright —
            # robot_manager.py:185-187 asserts "Do not use both camera and
            # lidar sensors together for now"; here both render in one
            # fused program, see render())
            obs["lidar_range_pixels"] = self._lidar_frames
        if self._lidar_seg is not None:
            obs["lidar_segmentation_pixels"] = self._lidar_seg
        if self._rgb_frames is not None:
            # reference robot_manager.py:160 (Isaac Gym native RGB camera)
            obs["rgb_pixels"] = self._rgb_frames
        return obs

    @property
    def sim_steps(self):
        return self.state.sim_steps

    def render(self, render_components: str = "sensors"):
        """Capture the robot's exteroceptive sensors (reference
        EnvManager.render('sensors') -> capture_sensors); the frames land in
        get_obs()["depth_range_pixels"] (+ "segmentation_pixels" when the
        sensor produces one). Configured sensor noise IS applied — a fresh
        capture key is drawn per call. No-op without a sensor.

        A robot with camera AND lidar enabled captures BOTH in one jitted
        program: the camera keeps the reference keys, the lidar lands in
        "lidar_range_pixels" / "lidar_segmentation_pixels". The reference
        cannot do this at all — robot_manager.py:185-187 asserts
        `not (enable_camera and enable_lidar)` ("Do not use both camera
        and lidar sensors together for now").

        render_components="rgb" additionally captures an onboard RGB image
        into get_obs()["rgb_pixels"] (reference global_tensor_dict key from
        the Isaac Gym native camera, robot_manager.py:160) — here shaded
        from the same ray-cast render (requires a camera sensor)."""
        if self.params.camera is None and self.params.lidar is None:
            return None
        if "rgb" in render_components:
            if self.params.camera is None:
                # don't leave callers guessing why rgb_pixels never appears
                logger.warning("render('rgb') requested but no camera sensor "
                               "is configured — rgb_pixels will not be "
                               "captured (lidar-only robot)")
            else:
                if self._jit_render_rgb is None:
                    from ..sensors.raycast_sensor import render_rgb_camera
                    params = self.params
                    self._jit_render_rgb = jax.jit(
                        lambda s: render_rgb_camera(params, s)[0])
                self._rgb_frames = self._jit_render_rgb(self.state)
        elif self._rgb_frames is not None:
            # a plain render() advances depth but not rgb: drop the stale rgb
            # frame rather than let get_obs() pair it with a newer depth image
            self._rgb_frames = None
        if self._jit_render is None:
            from ..sensors.raycast_sensor import render_camera, render_lidar
            params = self.params
            if params.camera is not None and params.lidar is not None:
                # both sensors in ONE fused program (one dispatch, shared
                # world-space primitive packing under XLA CSE)
                def fn(s, k):
                    k_cam, k_lid = jax.random.split(k)
                    return (render_camera(params, s, noise_key=k_cam)
                            + render_lidar(params, s, noise_key=k_lid))
            elif params.camera is not None:
                def fn(s, k):
                    return render_camera(params, s, noise_key=k) + (None, None)
            else:
                def fn(s, k):
                    return (None, None) + render_lidar(params, s, noise_key=k)
            self._jit_render = jax.jit(fn)
        if self._render_key is None:   # may already be set by load_state()
            self._render_key = jax.random.PRNGKey(
                self._py_rng.getrandbits(31))
        self._render_key, k = jax.random.split(self._render_key)
        cam_px, cam_seg, lid_px, lid_seg = self._jit_render(self.state, k)
        if self.params.camera is not None:
            self._sensor_frames, self._sensor_seg = cam_px, cam_seg
            self._lidar_frames, self._lidar_seg = lid_px, lid_seg
        else:
            # lidar-only robots keep the reference's single-sensor keys
            self._sensor_frames, self._sensor_seg = lid_px, lid_seg
        return self._sensor_frames

    def delete_env(self):
        self.state = None

    # -- full-sim checkpointing (SURVEY 5.4) -------------------------------
    # The reference never checkpoints simulator state (only RL-framework
    # checkpoints exist there, SURVEY.md 5.4); because SimState is one
    # explicit pytree here, offering it is a flat npz dump. Covers every
    # leaf (poses, velocities, motor/DOF state, obstacle slots, per-env
    # PRNG keys) plus the host-side step counter and substep RNG, so a
    # reloaded sim continues the exact same trajectory.

    def save_state(self, path: str):
        """Serialize the complete simulator state to ``path`` (.npz)."""
        import pickle

        import numpy as np

        leaves = jax.tree_util.tree_leaves(self.state)
        arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        arrs["step_counter"] = np.asarray(self.step_counter)
        arrs["py_rng"] = np.frombuffer(
            pickle.dumps(self._py_rng.getstate()), np.uint8)
        if self._render_key is not None:
            arrs["render_key"] = np.asarray(self._render_key)
        with open(path, "wb") as f:
            np.savez(f, **arrs)
        logger.info(f"sim state saved to {path} ({len(leaves)} arrays)")

    def load_state(self, path: str):
        """Restore a state saved by :meth:`save_state`. The current state
        pytree is the structure template, so the checkpoint must come from
        the same configuration (shapes are validated leaf by leaf)."""
        import pickle

        import numpy as np

        data = np.load(path)
        leaves, treedef = jax.tree_util.tree_flatten(self.state)
        new_leaves = []
        for i, cur in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            if arr.shape != cur.shape:
                raise ValueError(
                    f"sim checkpoint leaf {i} shape {arr.shape} != current "
                    f"{cur.shape} — was it saved from a different config?")
            new_leaves.append(jnp.asarray(arr, dtype=cur.dtype))
        self.state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        self.step_counter = int(data["step_counter"])
        self._py_rng.setstate(pickle.loads(data["py_rng"].tobytes()))
        # render-path state: restore the sensor-noise key stream and drop
        # frames captured on the abandoned trajectory (next render() or the
        # first render of a sensor-less sim re-fills them)
        if "render_key" in data.files:
            self._render_key = jnp.asarray(data["render_key"])
        else:
            self._render_key = None
        self._sensor_frames = None
        self._sensor_seg = None
        self._lidar_frames = None
        self._lidar_seg = None
        self._rgb_frames = None
        logger.info(f"sim state loaded from {path}")

    def log_memory_use(self):
        n_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(self.state))
        logger.warning(f"SimState device memory: {n_bytes / 1024 / 1024:.2f} MB")
