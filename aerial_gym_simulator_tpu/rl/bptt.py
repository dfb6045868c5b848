"""First-order policy optimization through the differentiable simulator.

BPTT ("analytic policy gradient") training: the policy is optimized by
reverse-mode AD straight through env_step — controller, motor lag, drag,
6-DoF integration — over short rollout windows, instead of the zeroth-order
score-function gradient PPO uses. The technique of DiffAero / "Learning to
Fly in Seconds" (PAPERS.md), impossible against the reference's closed
PhysX binary.

Characteristics (honest framing, measured on the position task):
  * Needs a SMOOTH objective: the task's exp-shaped reward has vanishing
    gradients at distance, so training minimizes a quadratic surrogate
    (default: squared position error + action effort — override with
    cost_fn) while the TASK reward is tracked for evaluation.
  * An order of magnitude fewer env-steps than PPO to reach a competent
    hover (~8-13 task reward within ~1.5k windows x 256 envs x 16 steps
    ≈ 6M env-steps), but with late-stage oscillation typical of
    deterministic BPTT — so the trainer keeps the best-EMA parameters and
    returns those.
  * Windows are truncated BPTT: each update backprops through `horizon`
    steps and the next window continues from the (detached) final state.

Use PPO (rl/ppo.py) for the reference's reward functions and tasks; use
this to exploit simulator gradients when you control the objective.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..utils.logging import CustomLogger

logger = CustomLogger("bptt")


@dataclass
class BPTTConfig:
    num_envs: int = 256
    horizon: int = 16          # truncated-BPTT window length
    lr: float = 2e-3
    max_grad_norm: float = 1.0
    iters: int = 1500
    hidden: Tuple[int, ...] = (64, 64)
    action_scale: float = 1.0  # tanh-bounded actions * scale
    act_reg: float = 0.01      # action-effort weight in the default cost
    ema: float = 0.98          # task-reward smoothing for best-params pick
    seed: int = 0
    remat: bool = False        # jax.checkpoint the step (long horizons/TPU)


class TanhPolicy(nn.Module):
    action_dim: int
    hidden: Tuple[int, ...] = (64, 64)
    scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.elu(nn.Dense(h)(x))
        a = nn.Dense(self.action_dim,
                     kernel_init=nn.initializers.orthogonal(0.5))(x)
        return self.scale * jnp.tanh(a)


def default_cost(obs, action, cfg: BPTTConfig):
    """Quadratic tracking surrogate for the position-setpoint family:
    obs[:, :3] is the WORLD-frame position error target - pos (the tasks
    expose it first, matching the reference's 13-d observation layout).
    The squared norm is frame-invariant; a custom cost_fn that weights
    axes differently must rotate into the frame it wants."""
    return (jnp.sum(obs[:, :3] ** 2, axis=1)
            + cfg.act_reg * jnp.sum(action ** 2, axis=1))


class BPTTTrainer:
    """Host loop around the jitted window update (rl/ppo.PPOTrainer analog).

    cost_fn(obs_next, action) -> (N,) per-env cost; defaults to the
    quadratic position surrogate. The TASK reward is only monitored.
    """

    def __init__(self, task, cfg: BPTTConfig,
                 cost_fn: Optional[Callable] = None):
        self.task = task
        self.cfg = cfg
        act_dim = task.task_config.action_space_dim
        self.policy = TanhPolicy(action_dim=act_dim, hidden=cfg.hidden,
                                 scale=cfg.action_scale)
        step_fn, self.carry, self.obs = task.make_step_fn()
        self.params = self.policy.init(jax.random.PRNGKey(cfg.seed),
                                       self.obs[:1])
        cost = cost_fn or (lambda o, a: default_cost(o, a, cfg))

        if cfg.remat:
            step_fn = jax.checkpoint(step_fn)

        def window(params, carry, obs):
            def body(c, _):
                carry, obs = c
                a = self.policy.apply(params, obs)
                carry, obs2, r, term, trunc = step_fn(carry, a)
                return (carry, obs2), (cost(obs2, a), r)

            (carry, obs), (cs, rs) = jax.lax.scan(
                body, (carry, obs), None, length=cfg.horizon)
            return jnp.mean(cs), (carry, obs, rs.mean())

        opt = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                          optax.adam(cfg.lr))
        self.opt_state = opt.init(self.params)

        def update(params, opt_state, carry, obs, ema, best_ema,
                   best_params, it):
            (loss, (carry, obs, rmean)), g = jax.value_and_grad(
                window, has_aux=True)(params, carry, obs)
            # rmean measured the window rolled with the INPUT params, so
            # the best-EMA snapshot keeps THOSE params (not the post-update
            # ones, which would be one destabilizing step past the peak);
            # tracking on device keeps the loop free of host syncs
            ema = jnp.where(it == 0, rmean,
                            cfg.ema * ema + (1.0 - cfg.ema) * rmean)
            better = ema > best_ema
            best_ema = jnp.where(better, ema, best_ema)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better, p, b), best_params, params)
            upd, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(params, upd), opt_state, carry, obs,
                    ema, best_ema, best_params, loss, rmean)

        self._update = jax.jit(update, donate_argnums=(2,))

    def train(self, iters: Optional[int] = None, log_every: int = 100):
        cfg = self.cfg
        iters = iters or cfg.iters
        ema = jnp.asarray(0.0)
        best_ema = jnp.asarray(-jnp.inf)
        best_params = self.params
        t0 = time.perf_counter()
        history = []
        for it in range(iters):
            (self.params, self.opt_state, self.carry, self.obs, ema,
             best_ema, best_params, loss, rmean) = self._update(
                 self.params, self.opt_state, self.carry, self.obs, ema,
                 best_ema, best_params, jnp.asarray(it))
            if it % log_every == 0 or it == iters - 1:
                # one batched D2H transfer (see rl/ppo.py train())
                rmean_h, ema_h, loss_h = jax.device_get((rmean, ema, loss))
                m = {"iter": it, "task_reward": float(rmean_h),
                     "task_reward_ema": float(ema_h),
                     "surrogate": float(loss_h),
                     "env_steps": (it + 1) * cfg.num_envs * cfg.horizon,
                     "wall_s": time.perf_counter() - t0}
                history.append(m)
                logger.info(f"it {it:5d} surrogate {m['surrogate']:.4f} "
                            f"task reward {m['task_reward']:7.3f} "
                            f"(ema {m['task_reward_ema']:6.3f}) "
                            f"steps {m['env_steps']:.2e}")
        # deterministic BPTT oscillates late; return the best-EMA snapshot
        self.params = best_params
        self.best_ema = float(best_ema)
        logger.info(f"best task-reward EMA {self.best_ema:.3f}; best-EMA "
                    f"params restored")
        return history

    def act(self, obs):
        return self.policy.apply(self.params, obs)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=256)
    p.add_argument("--horizon", type=int, default=16)
    p.add_argument("--iters", type=int, default=1500)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--multichip", action="store_true",
                   help="shard the env axis over all visible devices")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize before the mesh")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend before first device use (the axon TPU plugin ignores JAX_PLATFORMS=cpu; this flag is the reliable CPU-run switch)")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    if args.multihost:
        from ..parallel.distributed import initialize_multihost
        initialize_multihost(require=True)

    import aerial_gym_simulator_tpu as ag
    from .ppo import enable_compilation_cache

    enable_compilation_cache()
    task = ag.task_registry.make_task(args.task, num_envs=args.num_envs,
                                      seed=args.seed)
    cfg = BPTTConfig(num_envs=args.num_envs, horizon=args.horizon,
                     iters=args.iters, lr=args.lr, seed=args.seed)
    trainer = BPTTTrainer(task, cfg)
    if args.multichip or args.multihost:
        from ..parallel.distributed import shard_bptt_trainer
        shard_bptt_trainer(trainer)
    hist = trainer.train()
    print(f"final task reward {hist[-1]['task_reward']:.3f} "
          f"(ema {hist[-1]['task_reward_ema']:.3f}) after "
          f"{hist[-1]['env_steps']:.2e} env-steps, "
          f"{hist[-1]['wall_s']:.1f}s wall")


if __name__ == "__main__":
    main()
