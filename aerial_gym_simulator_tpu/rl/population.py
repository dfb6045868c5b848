"""Population training: K independent PPO learners in ONE compiled program.

Beyond-the-reference, TPU-first capability. The fused train step
(rl/ppo.py make_train_step) is a pure function
``(ts, env_carry, obs, key, norm) -> (ts, env_carry, obs, key, norm, m)``,
so an entire population of policies — each with its own network params,
optimizer state, adaptive learning rate, observation normalizer, PRNG
stream and environment batch — is just ``jax.vmap`` over a leading seed
axis. XLA compiles the whole population into one program; on a multi-chip
mesh the population axis shards across devices with ZERO collectives
(members are independent), so K chips train K members at single-member
speed.

Use cases the reference stack (one rl-games/sample-factory process per
seed) cannot express:
  * seed sweeps for variance bars in one run,
  * learning-rate populations (per-member initial lr; the adaptive-KL
    scheduler then evolves each member independently),
  * pick-best-and-deploy: any member exports as a standard checkpoint
    compatible with the sim2real deployment chain.

CLI::

    python -m aerial_gym_simulator_tpu.rl.population \
        --task position_setpoint_task --num_envs 1024 --num_seeds 8 \
        --total_steps 2000000 [--multichip] [--lr_sweep 1e-4 1e-3]
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax.training.train_state import TrainState

from ..utils.logging import CustomLogger
from .ppo import PPOConfig

logger = CustomLogger("population")


def _tree_stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def _tree_index(tree, i):
    return jax.tree_util.tree_map(lambda x: x[i], tree)


class PopulationTrainer:
    """K-member PPO population over one vmapped+jitted train step.

    task_factory(seed) must build a fresh task instance (e.g.
    ``lambda s: ag.task_registry.make_task(name, num_envs=N, seed=s)``).
    Each member gets its own env batch seeded by its member seed, exactly
    as a standalone ``PPOTrainer(task_factory(s), PPOConfig(seed=s))``
    would — member i of the population reproduces that standalone run
    bit-for-bit (tests/test_population.py).

    member_lrs: optional per-member INITIAL learning rates (requires
    cfg.lr_schedule == "adaptive", where the lr lives in optimizer state).
    """

    def __init__(self, task_factory: Callable[[int], object], cfg: PPOConfig,
                 num_seeds: int, seeds: Optional[Sequence[int]] = None,
                 member_lrs: Optional[Sequence[float]] = None):
        from .ppo import PPOTrainer  # reuse the single-member constructor

        self.cfg = cfg
        self.seeds = (list(seeds) if seeds is not None
                      else [cfg.seed + i for i in range(num_seeds)])
        if len(self.seeds) != num_seeds:
            raise ValueError("len(seeds) != num_seeds")
        if member_lrs is not None:
            if cfg.lr_schedule != "adaptive":
                raise ValueError(
                    "member_lrs needs lr_schedule='adaptive' (per-member lr "
                    "lives in the optimizer state; a 'fixed' lr is baked "
                    "into the compiled update)")
            if len(member_lrs) != num_seeds:
                raise ValueError("len(member_lrs) != num_seeds")
        self.num_seeds = num_seeds

        # build each member exactly like a standalone PPOTrainer so the
        # population is bit-identical to K separate runs
        members = []
        for s in self.seeds:
            import dataclasses
            mcfg = dataclasses.replace(cfg, seed=s)
            members.append(PPOTrainer(task_factory(s), mcfg))
        m0 = members[0]
        self.task = m0.task
        self.network = m0.network
        # every member runs member 0's compiled step closure, which
        # captures that task's SimParams — valid only when the task params
        # do not depend on the seed (true for the whole catalog: seeds
        # randomize STATE, params come from the config). Guard it: a
        # custom task with seed-dependent params must not silently train
        # K-1 members on member 0's dynamics.
        p0 = getattr(m0.task, "params", None)
        if p0 is not None:
            for m, s in zip(members[1:], self.seeds[1:]):
                same = jax.tree_util.tree_all(jax.tree_util.tree_map(
                    lambda a, b: bool(np.array_equal(np.asarray(a),
                                                     np.asarray(b))),
                    p0, getattr(m.task, "params", None)))
                if not same:
                    raise ValueError(
                        f"task_factory({s}) built different SimParams than "
                        f"task_factory({self.seeds[0]}): the population "
                        f"shares one step function, so task params must be "
                        f"seed-independent (seed-dependent randomization "
                        f"belongs in the state/reset path)")
        self.train_step_fn = m0.train_step_fn

        tx = m0.train_state.tx
        params = _tree_stack([m.train_state.params for m in members])
        opt_state = jax.vmap(tx.init)(params)
        if member_lrs is not None:
            lrs = jnp.asarray(member_lrs, jnp.float32)
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "learning_rate": lrs})
        self.train_state = TrainState(
            step=jnp.zeros((num_seeds,), jnp.int32),
            apply_fn=m0.train_state.apply_fn, params=params, tx=tx,
            opt_state=opt_state)
        self.norm = _tree_stack([m.norm for m in members])
        self.key = jnp.stack([m.key for m in members])
        self.env_carry = _tree_stack([m.env_carry for m in members])
        self.obs = _tree_stack([m.obs for m in members])

        self._train_step = jax.jit(jax.vmap(self.train_step_fn),
                                   donate_argnums=(1,))
        self.last_metrics = None

    # ---- multi-chip: shard the POPULATION axis (zero collectives) --------
    def shard(self, n_devices: Optional[int] = None, env_devices: int = 1):
        """Shard the population over a mesh. With env_devices == 1 every
        member lives on its own mesh slice and the compiled program has no
        cross-device communication at all — K devices run K members at
        single-member speed. env_devices > 1 builds a 2-D
        (population x env) mesh: each member's env batch additionally
        shards over env_devices chips (its gradient all-reduce rides the
        inner mesh axis), e.g. 8 chips = 2 members x 4-chip env sharding
        for large-env populations."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()
        if n_devices is None:
            n_devices = len(devices)
        if n_devices % env_devices:
            raise ValueError(f"n_devices {n_devices} must be a multiple of "
                             f"env_devices {env_devices}")
        pop_devices = n_devices // env_devices
        if self.num_seeds % pop_devices:
            raise ValueError(f"num_seeds {self.num_seeds} must be a "
                             f"multiple of the population mesh axis "
                             f"{pop_devices}")
        if self.cfg.num_envs % env_devices:
            raise ValueError(f"num_envs {self.cfg.num_envs} must be a "
                             f"multiple of env_devices {env_devices}")
        m = Mesh(np.asarray(devices[:n_devices]).reshape(
            pop_devices, env_devices), ("pop", "env"))
        pop_spec = NamedSharding(m, P("pop"))
        both_spec = NamedSharding(m, P("pop", "env"))
        N = self.cfg.num_envs

        def place_env(leaf):
            # env-batched member leaves: (K, N, ...) -> pop x env; member
            # scalars/aggregates: (K, ...) -> pop only
            if env_devices > 1 and leaf.ndim >= 2 and leaf.shape[1] == N:
                return jax.device_put(leaf, both_spec)
            return jax.device_put(leaf, pop_spec)

        for name in ("env_carry", "obs"):
            setattr(self, name, jax.tree_util.tree_map(
                place_env, getattr(self, name)))
        for name in ("train_state", "norm", "key"):
            setattr(self, name, jax.tree_util.tree_map(
                lambda x: jax.device_put(x, pop_spec), getattr(self, name)))
        logger.info(
            f"population sharded over {n_devices} devices "
            f"({pop_devices} pop x {env_devices} env; "
            f"{self.num_seeds // pop_devices} members per mesh row)")
        return m

    # ---- PBT: exploit/explore between vmapped train iterations -----------
    def _pbt_step(self, rewards: np.ndarray, rng: np.random.Generator,
                  fraction: float = 0.25,
                  lr_perturb: Sequence[float] = (0.8, 1.25)):
        """One population-based-training step (Jaderberg et al. 2017,
        "Population Based Training of Neural Networks",
        arXiv:1711.09846): each bottom-`fraction` member copies the learner state
        (params, optimizer, obs/value normalizer) of a random
        top-`fraction` member, then perturbs its learning rate by a random
        factor from `lr_perturb` — exploit + explore. Env state and PRNG
        stream stay the member's own. Requires lr_schedule='adaptive'
        (the lr must live in optimizer state to be perturbable)."""
        if self.cfg.lr_schedule != "adaptive":
            raise ValueError(
                "PBT needs lr_schedule='adaptive': with 'fixed' the lr is "
                "baked into the compiled update and the explore step "
                "cannot perturb it")
        if not 0.0 < fraction <= 0.5:
            raise ValueError(f"pbt fraction must be in (0, 0.5] so winners "
                             f"and losers cannot overlap (got {fraction})")
        K = self.num_seeds
        q = min(max(int(round(K * fraction)), 1), K // 2)
        if q < 1:
            raise ValueError(f"population of {K} is too small for PBT")
        order = np.argsort(rewards)           # ascending
        losers, winners = order[:q], order[K - q:]
        events = []
        for dst in losers:
            src = int(rng.choice(winners))
            dst = int(dst)
            copy_at = lambda x: x.at[dst].set(x[src])
            self.train_state = self.train_state.replace(
                params=jax.tree_util.tree_map(copy_at,
                                              self.train_state.params),
                opt_state=jax.tree_util.tree_map(copy_at,
                                                 self.train_state.opt_state))
            self.norm = jax.tree_util.tree_map(copy_at, self.norm)
            factor = float(rng.choice(lr_perturb))
            hp = self.train_state.opt_state.hyperparams
            lr = hp["learning_rate"]
            lr = lr.at[dst].set(jnp.clip(lr[dst] * factor,
                                         self.cfg.min_lr, self.cfg.max_lr))
            self.train_state = self.train_state.replace(
                opt_state=self.train_state.opt_state._replace(
                    hyperparams={**hp, "learning_rate": lr}))
            events.append((dst, src, factor))
        return events

    def train(self, total_env_steps: Optional[int] = None,
              log_every: int = 10, pbt_every: int = 0,
              pbt_fraction: float = 0.25):
        """pbt_every > 0 enables population-based training: every
        `pbt_every` iterations the bottom pbt_fraction of members exploit
        (copy a top member's learner state) and explore (perturb lr)."""
        cfg = self.cfg
        total = total_env_steps or cfg.total_env_steps
        steps_per_iter = cfg.num_envs * cfg.horizon  # per member
        iters = max(total // steps_per_iter, 1)
        history = []
        pbt_rng = np.random.default_rng(cfg.seed)
        t_start = time.perf_counter()
        # Steady-state reference point after the first (compiling) iteration
        # so sps(all) excludes the one-time XLA compile (see rl/ppo.py).
        t_steady = None
        steps_steady = 0
        for it in range(iters):
            (self.train_state, self.env_carry, self.obs, self.key, self.norm,
             metrics) = self._train_step(self.train_state, self.env_carry,
                                         self.obs, self.key, self.norm)
            if t_steady is None:
                jax.block_until_ready(metrics)
                t_steady = time.perf_counter()
                steps_steady = (it + 1) * steps_per_iter
            if pbt_every and (it + 1) % pbt_every == 0 and it != iters - 1:
                rewards = np.asarray(metrics["reward_mean"])
                for dst, src, f in self._pbt_step(rewards, pbt_rng,
                                                  pbt_fraction):
                    logger.info(f"pbt it {it}: member {dst} "
                                f"(reward {rewards[dst]:.3f}) <- member "
                                f"{src} (reward {rewards[src]:.3f}), "
                                f"lr x{f}")
            if it % log_every == 0 or it == iters - 1:
                # one batched D2H transfer (see rl/ppo.py train(): per-leaf
                # fetches over a tunneled backend dominate the train step)
                m = dict(jax.device_get(metrics))
                m["iter"] = it
                m["env_steps"] = (it + 1) * steps_per_iter
                now = time.perf_counter()
                m["wall_s"] = now - t_start
                dt, dsteps = now - t_steady, m["env_steps"] - steps_steady
                sps = (dsteps / dt if dsteps > 0 and dt > 0
                       else m["env_steps"] / m["wall_s"])
                m["env_steps_per_s"] = self.num_seeds * sps
                history.append(m)
                r = m["reward_mean"]
                logger.info(
                    f"it {it:4d} steps/member {m['env_steps']:.2e} "
                    f"reward best {r.max():7.3f} / mean {r.mean():7.3f} / "
                    f"worst {r.min():7.3f} "
                    f"sps(all) {m['env_steps_per_s']:.0f}")
        self.last_metrics = history[-1] if history else None
        return history

    def best_member(self, metric: str = "reward_mean") -> int:
        if self.last_metrics is None:
            raise RuntimeError("train() first")
        return int(np.argmax(self.last_metrics[metric]))

    def member_checkpoint(self, i: int, path: str):
        """Export member i as a standard PPOTrainer checkpoint — compatible
        with load_checkpoint, export_policy_npz and the whole deployment
        chain (pick-best-and-deploy)."""
        import pickle

        from flax import serialization

        params_i = _tree_index(self.train_state.params, i)
        norm_i = {k: np.asarray(v[i]) for k, v in self.norm.items()}
        cfg_dict = dict(self.cfg.__dict__)
        cfg_dict["seed"] = self.seeds[i]
        with open(path, "wb") as f:
            pickle.dump({
                "params": serialization.to_bytes(params_i),
                "norm": norm_i,
                "cfg": cfg_dict,
                "obs_dim": int(self.task.task_config.observation_space_dim),
                "action_dim": int(self.task.task_config.action_space_dim),
            }, f)
        logger.info(f"member {i} (seed {self.seeds[i]}) saved to {path}")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=1024,
                   help="envs PER MEMBER")
    p.add_argument("--num_seeds", type=int, default=8)
    p.add_argument("--total_steps", type=int, default=2_000_000,
                   help="env steps per member")
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--seed", type=int, default=42,
                   help="first member seed (members use seed..seed+K-1)")
    p.add_argument("--lr_sweep", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="log-spaced per-member initial learning rates")
    p.add_argument("--multichip", action="store_true",
                   help="shard the population axis over all devices")
    p.add_argument("--env_devices", type=int, default=1,
                   help="with --multichip: 2-D mesh — each member's env "
                        "batch also shards over this many chips")
    p.add_argument("--save_best", default=None,
                   help="write the best member's checkpoint here")
    p.add_argument("--pbt_every", type=int, default=0,
                   help="population-based training: exploit/explore every "
                        "N iterations (0 = plain population)")
    p.add_argument("--pbt_fraction", type=float, default=0.25)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend before first device use (the axon TPU plugin ignores JAX_PLATFORMS=cpu; this flag is the reliable CPU-run switch)")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    import aerial_gym_simulator_tpu as ag
    from .ppo import enable_compilation_cache

    enable_compilation_cache()
    cfg = PPOConfig(num_envs=args.num_envs, horizon=args.horizon,
                    minibatch_size=min(8192, args.num_envs * args.horizon),
                    total_env_steps=args.total_steps, seed=args.seed)
    lrs = None
    if args.lr_sweep:
        lrs = list(np.geomspace(args.lr_sweep[0], args.lr_sweep[1],
                                args.num_seeds).astype(np.float32))
        logger.info(f"lr population: {lrs}")
    pop = PopulationTrainer(
        lambda s: ag.task_registry.make_task(args.task,
                                             num_envs=args.num_envs, seed=s),
        cfg, num_seeds=args.num_seeds, member_lrs=lrs)
    if args.multichip:
        pop.shard(env_devices=args.env_devices)
    pop.train(pbt_every=args.pbt_every, pbt_fraction=args.pbt_fraction)
    best = pop.best_member()
    r = pop.last_metrics["reward_mean"]
    print(f"best member: {best} (seed {pop.seeds[best]}) "
          f"reward {r[best]:.3f}; population rewards: "
          f"{np.array2string(r, precision=3)}")
    if args.save_best:
        pop.member_checkpoint(best, args.save_best)


if __name__ == "__main__":
    main()
