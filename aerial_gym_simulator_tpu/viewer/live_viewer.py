"""Live interactive viewer — the keyboard-driven counterpart of the
reference's Isaac Gym viewer (reference env_manager/IGE_viewer_control.py:
16-296: follow modes, reset-all / pause / env-switch / sync-toggle
keyboard events).

Renders the OfflineViewer's chase/fixed camera into a matplotlib window
and drives a user-provided env/task with the same key map as the
reference viewer:

  R        reset all envs               (reference: reset_all_envs)
  P/space  pause / unpause              (reference: toggle pause)
  F        toggle follow mode           (FOLLOW_ROBOT <-> FIXED)
  [ / ]    previous / next tracked env  (reference: switch_target_env)
  S        toggle render sync (render every frame vs every Nth)
  Q/escape quit

Works on any workstation with a display backend; on a headless TPU host
use OfflineViewer (render-to-PPM/AVI) instead — ``LiveViewer(...).run()``
raises a clear error when no GUI backend is available unless
``backend="Agg"`` is forced (used by the tests, which drive ``on_key`` /
``step_once`` directly).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from ..utils.logging import CustomLogger
from .offline_viewer import OfflineViewer

logger = CustomLogger("live_viewer")


class LiveViewer:
    """Interactive window around a SimBuilder env or a Task.

    env: object exposing ``params``, ``state``, ``reset()`` and
         ``step(actions)`` (EnvManager and every Task qualify).
    action_fn: optional callable ``state -> actions``; defaults to zeros
         (hover under an attitude controller).
    """

    def __init__(self, env, action_fn: Optional[Callable] = None,
                 width: int = 320, height: int = 240, env_index: int = 0,
                 render_every: int = 2, backend: Optional[str] = None):
        self.env = env
        self.action_fn = action_fn
        self.viewer = OfflineViewer(env.params, width=width, height=height,
                                    env_id=env_index)
        self.env_index = env_index
        self.paused = False
        self.sync = True            # render every frame
        self.render_every = render_every
        self.quit = False
        self._frame_i = 0
        self._backend = backend

    def _rejit(self):
        # env_id / camera mode are trace-time constants of the offline
        # viewer's jitted render — rebuild the jit wrapper to retrace
        import jax
        self.viewer._render = jax.jit(self.viewer._render_fn)

    # -- keyboard handling (reference IGE_viewer_control key map) ---------
    def on_key(self, key: Optional[str]):
        if key is None:
            return
        key = key.lower()
        if key == "r":
            self.env.reset()
            logger.info("viewer: reset all envs")
        elif key in ("p", " "):
            self.paused = not self.paused
            logger.info(f"viewer: {'paused' if self.paused else 'running'}")
        elif key == "f":
            mode = ("fixed" if self.viewer.mode == "follow_robot"
                    else "follow_robot")
            self.viewer.mode = mode
            self._rejit()
            logger.info(f"viewer: camera mode {mode}")
        elif key in ("[", "]"):
            n = self.env.state.num_envs
            delta = 1 if key == "]" else -1
            self.env_index = (self.env_index + delta) % n
            self.viewer.env_id = self.env_index
            self._rejit()
            logger.info(f"viewer: tracking env {self.env_index}")
        elif key == "s":
            self.sync = not self.sync
            logger.info(f"viewer: render sync {self.sync}")
        elif key in ("q", "escape"):
            self.quit = True

    def _actions(self):
        import jax.numpy as jnp
        if self.action_fn is not None:
            return self.action_fn(self.env.state)
        n_act = getattr(getattr(self.env, "params", None), "controller", None)
        dim = n_act.num_actions if n_act is not None else 4
        return jnp.zeros((self.env.state.num_envs, dim))

    def step_once(self) -> Optional[np.ndarray]:
        """Advance the sim one step (unless paused) and return a frame
        when one is due (sync or every render_every steps)."""
        if not self.paused:
            self.env.step(self._actions())
        self._frame_i += 1
        due = self.sync or (self._frame_i % self.render_every == 0)
        if not due:
            return None
        return self.viewer.render(self.env.state, store=False)

    # -- window loop ------------------------------------------------------
    def run(self, max_steps: Optional[int] = None):
        import matplotlib
        if self._backend:
            matplotlib.use(self._backend)
        import matplotlib.pyplot as plt
        if not self._backend and matplotlib.get_backend().lower() == "agg":
            raise RuntimeError(
                "no GUI matplotlib backend available — this host is "
                "headless; use OfflineViewer (render-to-PPM/AVI) instead, "
                "see docs/4_simulation_components.md")

        fig, ax = plt.subplots(figsize=(6, 4.5))
        fig.canvas.manager.set_window_title("aerial_gym_simulator_tpu")
        fig.canvas.mpl_connect("key_press_event",
                               lambda e: self.on_key(e.key))
        im = ax.imshow(np.zeros((self.viewer.height, self.viewer.width, 3),
                                np.uint8))
        ax.set_axis_off()
        ax.set_title("R reset | P pause | F follow | [ ] env | S sync | Q quit",
                     fontsize=8)
        plt.ion()
        plt.show()
        steps = 0
        while not self.quit and (max_steps is None or steps < max_steps):
            frame = self.step_once()
            if frame is not None:
                im.set_data(frame)
                fig.canvas.draw_idle()
            plt.pause(0.001)
            steps += 1
        plt.close(fig)


def main():  # pragma: no cover — needs a display
    import argparse

    from ..sim.sim_builder import SimBuilder

    p = argparse.ArgumentParser("live interactive viewer")
    p.add_argument("--sim", default="base_sim")
    p.add_argument("--env", default="env_with_obstacles")
    p.add_argument("--robot", default="base_quadrotor")
    p.add_argument("--controller", default="lee_attitude_control")
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--steps", type=int, default=None)
    args = p.parse_args()

    env = SimBuilder().build_env(args.sim, args.env, args.robot,
                                 args.controller, num_envs=args.num_envs,
                                 seed=0)
    env.reset()
    LiveViewer(env).run(max_steps=args.steps)


if __name__ == "__main__":
    main()
