"""PPO learner — fully on-device rollout + update in one jitted train step.

Capability parity with the reference's RL stack (rl_training/: rl-games
runner, CleanRL ppo_continuous_action.py with GPU-vectorized GAE): clipped
PPO, GAE(lambda), advantage normalization, entropy bonus, lr/clip from a
config mirroring ppo_aerial_quad.yaml (8192 envs, horizon 32, minibatch
8192, gamma 0.99).

TPU-first design: the environment rollout is a lax.scan over the fused task
step, so T env-steps x N envs + GAE + the full epoch/minibatch PPO update
compile into ONE XLA program. Multi-chip: env axis sharded over the mesh,
params replicated; XLA inserts the gradient all-reduce (see parallel/).
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training.train_state import TrainState

from ..sim.structs import SimParams, SimState
from ..utils.logging import CustomLogger
from .networks import (ActorCritic, ActorCriticGRU, gaussian_entropy,
                       gaussian_logp, sample_action)

logger = CustomLogger("ppo")


@dataclass
class PPOConfig:
    """Defaults follow rl_training/rl_games/ppo_aerial_quad.yaml."""
    num_envs: int = 8192
    horizon: int = 32
    minibatch_size: int = 8192
    epochs: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_coef: float = 2.0
    entropy_coef: float = 0.0
    lr: float = 3e-4
    # learning-rate schedule (reference ppo_aerial_quad.yaml:46-47 trains
    # with rl-games' adaptive KL scheduler): "adaptive" raises/lowers the
    # lr by 1.5x per minibatch when the approximate policy KL leaves the
    # [kl_threshold/2, 2*kl_threshold] band; "fixed" keeps cfg.lr.
    lr_schedule: str = "adaptive"
    kl_threshold: float = 0.016
    min_lr: float = 1e-6
    max_lr: float = 1e-2
    max_grad_norm: float = 1.0
    total_env_steps: int = 50_000_000
    hidden: Tuple[int, ...] = (256, 128, 64)
    activation: str = "elu"
    normalize_advantage: bool = True
    normalize_obs: bool = True
    # rl-games parity knobs (reference ppo_aerial_quad.yaml):
    # value_bootstrap adds gamma*V(s_t) to the reward at TRUNCATED steps
    # (rl-games a2c_common play_steps time_outs handling) so timeouts are
    # not treated as true terminals; bounds_loss penalizes policy means
    # outside [-1.1, 1.1] (rl-games bound_loss soft bound);
    # normalize_value trains the critic in running-normalized return space
    # (rl-games value_mean_std).
    value_bootstrap: bool = True
    bounds_loss_coef: float = 0.0001
    normalize_value: bool = False
    reward_scale: float = 0.1
    seed: int = 42
    # recurrent policy: None (MLP) or "gru". With "gru" the policy carries
    # a hidden state across steps (ActorCriticGRU); the PPO update replays
    # whole env sequences (truncated BPTT over the horizon) and minibatches
    # over ENVS instead of steps. The reference can only train recurrent
    # policies via the external sample-factory stack; here it is native.
    rnn: Optional[str] = None
    rnn_hidden: int = 256
    # matmul precision for the NETWORK ops (policy inference + grads; the
    # env physics keeps default precision). TPU f32 matmuls decompose into
    # multiple bf16 passes; "bfloat16" runs the MXU natively (~3x on the
    # small MLP grads that dominate the update) with f32 accumulation —
    # well within PPO's noise floor. Set "highest" for full f32.
    matmul_precision: str = "bfloat16"


_RESTORE_HINT = (
    "orbax restore failed. If this checkpoint was written under a "
    "different lr_schedule, the optimizer-state layout differs "
    "('adaptive' wraps it in optax.inject_hyperparams; 'fixed' does not) "
    "— construct the trainer with the SAME PPOConfig.lr_schedule the "
    "checkpoint was trained with.")


class RunningMeanStd:
    """Functional running obs normalizer state (as pytree dict)."""

    @staticmethod
    def init(dim):
        return {
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32),
            "count": jnp.asarray(1e-4, jnp.float32),
        }

    @staticmethod
    def update(s, batch2d):
        b_mean = batch2d.mean(axis=0)
        b_var = batch2d.var(axis=0)
        b_count = jnp.asarray(batch2d.shape[0], jnp.float32)
        delta = b_mean - s["mean"]
        tot = s["count"] + b_count
        mean = s["mean"] + delta * b_count / tot
        m_a = s["var"] * s["count"]
        m_b = b_var * b_count
        M2 = m_a + m_b + delta * delta * s["count"] * b_count / tot
        # preserve any co-located stats (e.g. the v_* value-return keys)
        out = dict(s)
        out.update(mean=mean, var=M2 / tot, count=tot)
        return out

    @staticmethod
    def normalize(s, x):
        return jnp.clip((x - s["mean"]) / jnp.sqrt(s["var"] + 1e-8), -5.0, 5.0)


def _vstats_update(norm, x):
    """Update the scalar value-return running stats stored alongside the
    obs stats (keys v_mean/v_var/v_count; rl-games value_mean_std)."""
    b_mean = x.mean()
    b_var = x.var()
    b_count = jnp.asarray(x.size, jnp.float32)
    delta = b_mean - norm["v_mean"]
    tot = norm["v_count"] + b_count
    mean = norm["v_mean"] + delta * b_count / tot
    M2 = (norm["v_var"] * norm["v_count"] + b_var * b_count
          + delta * delta * norm["v_count"] * b_count / tot)
    out = dict(norm)
    out.update(v_mean=mean, v_var=M2 / tot, v_count=tot)
    return out


def _v_normalize(norm, v):
    return (v - norm["v_mean"]) / jnp.sqrt(norm["v_var"] + 1e-8)


def _v_unnormalize(norm, v):
    return v * jnp.sqrt(norm["v_var"] + 1e-8) + norm["v_mean"]


def _bounds_loss(mean):
    """rl-games bound_loss: quadratic penalty outside the 1.1 soft bound."""
    high = jnp.maximum(mean - 1.1, 0.0) ** 2
    low = jnp.minimum(mean + 1.1, 0.0) ** 2
    return jnp.mean(jnp.sum(high + low, axis=-1))


def _gae(gamma: float, lam: float, values, rewards, dones, last_value):
    """GAE(lambda) over a time-major (T, N) rollout — shared by the MLP and
    RNN train steps so the bootstrapping math can never diverge between
    them (reference analog: cleanrl ppo_continuous_action.py GPU-vectorized
    GAE)."""
    def scan_fn(gae, t):
        v, r, d, v_next = t
        delta = r + gamma * v_next * (1.0 - d) - v
        gae = delta + gamma * lam * (1.0 - d) * gae
        return gae, gae

    v_next = jnp.concatenate([values[1:], last_value[None]], axis=0)
    _, adv = jax.lax.scan(scan_fn, jnp.zeros_like(last_value),
                          (values, rewards, dones, v_next), reverse=True)
    return adv, adv + values


def _rollout_metrics(cfg: PPOConfig, rewards_t, dones_t, terms_t, values_t,
                     aux, ts):
    pg_loss, v_loss, ent, kl = jax.tree_util.tree_map(jnp.mean, aux)
    return {
        "reward_mean": rewards_t.mean() / cfg.reward_scale,
        "done_rate": dones_t.mean(),
        "crash_rate": terms_t.mean(),
        "pg_loss": pg_loss,
        "v_loss": v_loss,
        "entropy": ent,
        "approx_kl": kl,
        "lr": _current_lr(cfg, ts),
        "value_mean": values_t.mean(),
    }


def _current_lr(cfg: PPOConfig, ts):
    if cfg.lr_schedule == "adaptive":
        return ts.opt_state.hyperparams["learning_rate"]
    return jnp.asarray(cfg.lr)


def _adapt_lr(cfg: PPOConfig, ts, kl):
    """rl-games AdaptiveScheduler semantics (per-minibatch): shrink the lr
    1.5x when the policy moved too far (kl > 2*threshold), grow it 1.5x
    when it barely moved (kl < threshold/2), clamped to [min_lr, max_lr]."""
    if cfg.lr_schedule != "adaptive":
        return ts
    lr = ts.opt_state.hyperparams["learning_rate"]
    lr = jnp.where(kl > 2.0 * cfg.kl_threshold,
                   jnp.maximum(lr / 1.5, cfg.min_lr),
                   jnp.where(kl < 0.5 * cfg.kl_threshold,
                             jnp.minimum(lr * 1.5, cfg.max_lr), lr))
    new_opt_state = ts.opt_state._replace(
        hyperparams={**ts.opt_state.hyperparams, "learning_rate": lr})
    return ts.replace(opt_state=new_opt_state)


def make_train_step(step_fn, cfg: PPOConfig):
    """Build the single jitted train step over ANY fused task step.

    step_fn(carry, action) -> (carry, obs, reward, term, trunc)
    where carry is the task's full state pytree (SimState, NavState, ...).
    Signature: (train_state, carry, obs, key, norm) -> (..., metrics).
    """

    N, T = cfg.num_envs, cfg.horizon
    batch = N * T
    # clamp like the RNN path: a minibatch can never exceed the rollout
    mb_size = min(cfg.minibatch_size, batch)
    n_minibatches = batch // mb_size
    if mb_size != cfg.minibatch_size:
        logger.info(f"minibatch_size {cfg.minibatch_size} > rollout batch "
                    f"{batch}: clamped to one {batch}-sample minibatch")
    if batch % mb_size:
        dropped = batch - n_minibatches * mb_size
        logger.warning(
            f"batch {batch} (= {N} envs x {T} horizon) is not a multiple of "
            f"minibatch_size {mb_size}: {dropped} samples "
            f"({100.0 * dropped / batch:.1f}%) are dropped from every epoch "
            f"(a random subset per shuffle)")

    # matmul precision is scoped to the NETWORK ops only (policy inference
    # + grads, where the speedup lives); the env physics traced by step_fn
    # stays at default precision so train-time dynamics match eval-time
    # dynamics exactly
    def apply_net(net_params, ts, x):
        with jax.default_matmul_precision(cfg.matmul_precision):
            return ts.apply_fn(net_params, x)

    def env_step(carry, _):
        ts, env_carry, obs, key, norm = carry
        key, akey = jax.random.split(key)
        norm_obs = RunningMeanStd.normalize(norm, obs) if cfg.normalize_obs else obs
        mean, log_std, value = apply_net(ts.params, ts, norm_obs)
        if cfg.normalize_value:
            value = _v_unnormalize(norm, value)
        action, logp = sample_action(mean, log_std, akey)
        env_carry, next_obs, reward, term, trunc = step_fn(env_carry, action)
        done = jnp.maximum(term, trunc)
        shaped = reward * cfg.reward_scale
        if cfg.value_bootstrap:
            # rl-games time_outs bootstrap: truncation is not a terminal
            shaped = shaped + cfg.gamma * value * trunc
        transition = (norm_obs, action, logp, value, shaped, done, term)
        return (ts, env_carry, next_obs, key, norm), transition

    def loss_fn(net_params, ts, mb):
        obs, action, old_logp, old_value, adv, ret = mb
        mean, log_std, value = apply_net(net_params, ts, obs)
        logp = gaussian_logp(mean, log_std, action)
        d = logp - old_logp
        ratio = jnp.exp(d)
        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        v_clipped = old_value + jnp.clip(value - old_value, -cfg.clip_eps,
                                         cfg.clip_eps)
        v_loss = 0.5 * jnp.mean(jnp.maximum((value - ret) ** 2,
                                            (v_clipped - ret) ** 2))
        ent = jnp.mean(gaussian_entropy(log_std))
        # non-negative approximate KL(old || new) (the k3 estimator) for
        # the adaptive lr scheduler; stop_gradient: diagnostics only
        kl = jax.lax.stop_gradient(jnp.mean(ratio - 1.0 - d))
        total = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * ent
        if cfg.bounds_loss_coef:
            total = total + cfg.bounds_loss_coef * _bounds_loss(mean)
        return total, (pg_loss, v_loss, ent, kl)

    def train_step(ts: TrainState, env_carry, obs, key, norm):
        # ---- rollout (scan over fused env step) --------------------------
        (ts, env_carry, obs, key, norm), traj = jax.lax.scan(
            env_step, (ts, env_carry, obs, key, norm), None, length=T)
        norm_obs_t, actions_t, logps_t, values_t, rewards_t, dones_t, terms_t = traj

        if cfg.normalize_obs:
            norm = RunningMeanStd.update(norm, norm_obs_t.reshape(batch, -1))

        last_norm_obs = (RunningMeanStd.normalize(norm, obs)
                         if cfg.normalize_obs else obs)
        _, _, last_value = apply_net(ts.params, ts, last_norm_obs)
        if cfg.normalize_value:
            last_value = _v_unnormalize(norm, last_value)
        adv_t, ret_t = _gae(cfg.gamma, cfg.gae_lambda, values_t, rewards_t,
                            dones_t, last_value)
        values_st, ret_st = values_t, ret_t
        if cfg.normalize_value:
            # rl-games order: update stats on values, normalize; then on
            # returns, normalize — the loss then runs in normalized space
            norm = _vstats_update(norm, values_t)
            values_st = _v_normalize(norm, values_t)
            norm = _vstats_update(norm, ret_t)
            ret_st = _v_normalize(norm, ret_t)

        flat = lambda x: x.reshape((batch,) + x.shape[2:])
        # Pack every per-sample array into ONE (batch, D) matrix so the
        # per-epoch shuffle is a single wide row-gather. Gathering the 1-D
        # arrays (logp/value/adv/ret) separately is catastrophically slow on
        # TPU (~280 MB/s measured: 262144 single-float random fetches each);
        # one row-gather of contiguous D-float rows runs orders of magnitude
        # faster and cut the 8192-env position-PPO update from ~28 ms/epoch
        # to ~1 ms/epoch.
        obs_dim = norm_obs_t.shape[-1]
        act_dim = actions_t.shape[-1]
        data2d = jnp.concatenate(
            [flat(norm_obs_t), flat(actions_t), flat(logps_t)[:, None],
             flat(values_st)[:, None], flat(adv_t)[:, None],
             flat(ret_st)[:, None]], axis=1)

        def unpack(mb):
            o = mb[:, :obs_dim]
            a = mb[:, obs_dim:obs_dim + act_dim]
            rest = mb[:, obs_dim + act_dim:]
            return o, a, rest[:, 0], rest[:, 1], rest[:, 2], rest[:, 3]

        # shuffle granularity: permuting 8-row blocks instead of single
        # rows moves contiguous ~0.7 KB chunks per gather element (vs 84 B),
        # which is the difference between DMA-bound and descriptor-bound on
        # TPU. A block = 8 same-timestep adjacent envs — minibatch mixing
        # stays statistically equivalent for PPO at these batch sizes.
        blk = 8 if batch % 8 == 0 else 1
        n_blocks = batch // blk
        D = data2d.shape[1]
        data_blk = data2d.reshape(n_blocks, blk * D)

        # ---- PPO epochs ---------------------------------------------------
        def epoch(carry, _):
            ts, key = carry
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, n_blocks)
            shuffled = data_blk[perm].reshape(batch, D)

            def minibatch(ts, mb_idx):
                mb = jax.lax.dynamic_slice_in_dim(
                    shuffled, mb_idx * mb_size, mb_size, axis=0)
                obs_mb, act_mb, logp_mb, val_mb, adv_mb, ret_mb = unpack(mb)
                if cfg.normalize_advantage:
                    adv_mb = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
                mb = (obs_mb, act_mb, logp_mb, val_mb, adv_mb, ret_mb)
                grads, aux = jax.grad(loss_fn, has_aux=True)(ts.params, ts, mb)
                ts = ts.apply_gradients(grads=grads)
                return _adapt_lr(cfg, ts, aux[3]), aux

            ts, aux = jax.lax.scan(minibatch, ts, jnp.arange(n_minibatches))
            return (ts, key), aux

        (ts, key), aux = jax.lax.scan(epoch, (ts, key), None, length=cfg.epochs)
        metrics = _rollout_metrics(cfg, rewards_t, dones_t, terms_t,
                                   values_t, aux, ts)
        return ts, env_carry, obs, key, norm, metrics

    return train_step


def make_train_step_rnn(step_fn, cfg: PPOConfig):
    """Recurrent variant of :func:`make_train_step` (cfg.rnn == "gru").

    Differences from the MLP path, all forced by recurrence:
      * the rollout scan carries the GRU hidden state, zeroed at episode
        boundaries (done masking) — the env carry becomes
        ``(task_carry, hidden, done_prev)`` so elastic checkpoints and
        shard_trainer cover it for free;
      * the PPO update minibatches over ENVS (whole sequences), replaying
        each sequence from the stored rollout-start hidden with the
        CURRENT params (a lax.scan over the horizon inside the loss) —
        hiddens are never stale, unlike rl-games' stored-hidden replay;
      * sequences pack as contiguous (env, T*D) rows so the per-epoch
        shuffle stays one wide row-gather (same TPU rule as the MLP path:
        never gather small rows).
    """

    N, T = cfg.num_envs, cfg.horizon
    mb_envs = max(min(cfg.minibatch_size // T, N), 1)
    n_minibatches = max(N // mb_envs, 1)
    if mb_envs * T != min(cfg.minibatch_size, N * T):
        logger.info(
            f"rnn minibatches are whole env sequences: effective minibatch "
            f"is {mb_envs} envs x {T} steps = {mb_envs * T} samples "
            f"(requested minibatch_size {cfg.minibatch_size})")
    if N % mb_envs:
        dropped = N - n_minibatches * mb_envs
        logger.warning(
            f"num_envs {N} is not a multiple of the {mb_envs}-env sequence "
            f"minibatch: {dropped} env sequences "
            f"({100.0 * dropped / N:.1f}% of collected data) are dropped "
            f"from every epoch (a random subset per shuffle)")

    def apply_net(net_params, ts, x, h):
        with jax.default_matmul_precision(cfg.matmul_precision):
            return ts.apply_fn(net_params, x, h)

    def env_step(carry, _):
        ts, (env_carry, h, done_prev), obs, key, norm = carry
        key, akey = jax.random.split(key)
        norm_obs = RunningMeanStd.normalize(norm, obs) if cfg.normalize_obs else obs
        h_in = h * (1.0 - done_prev)[:, None]
        mean, log_std, value, h_new = apply_net(ts.params, ts, norm_obs, h_in)
        if cfg.normalize_value:
            value = _v_unnormalize(norm, value)
        action, logp = sample_action(mean, log_std, akey)
        env_carry, next_obs, reward, term, trunc = step_fn(env_carry, action)
        done = jnp.maximum(term, trunc)
        shaped = reward * cfg.reward_scale
        if cfg.value_bootstrap:
            shaped = shaped + cfg.gamma * value * trunc
        transition = (norm_obs, action, logp, value, shaped,
                      done, term, done_prev)
        return (ts, (env_carry, h_new, done), next_obs, key, norm), transition

    def loss_fn(net_params, ts, mb, h0_mb):
        # mb fields are (E, T, ...); replay time-major inside the loss
        obs, action, old_logp, old_value, adv, ret, done_prev = mb
        tm = lambda x: jnp.swapaxes(x, 0, 1)  # (T, E, ...)

        def cell(h, xs):
            o_t, dp_t = xs
            h = h * (1.0 - dp_t)[:, None]
            mean, _, value, h = apply_net(net_params, ts, o_t, h)
            return h, (mean, value)

        _, (means, values) = jax.lax.scan(
            cell, h0_mb, (tm(obs), tm(done_prev)))
        # the (A,) log_std param is scan-independent: read it once from the
        # params instead of emitting a (T, A) copy per step
        log_std = net_params["params"]["log_std"]

        logp = gaussian_logp(means, log_std, tm(action))
        d = logp - tm(old_logp)
        ratio = jnp.exp(d)
        adv_t = tm(adv)
        pg1 = -adv_t * ratio
        pg2 = -adv_t * jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps)
        pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
        old_v_t, ret_t = tm(old_value), tm(ret)
        v_clipped = old_v_t + jnp.clip(values - old_v_t, -cfg.clip_eps,
                                       cfg.clip_eps)
        v_loss = 0.5 * jnp.mean(jnp.maximum((values - ret_t) ** 2,
                                            (v_clipped - ret_t) ** 2))
        ent = jnp.mean(gaussian_entropy(log_std))
        kl = jax.lax.stop_gradient(jnp.mean(ratio - 1.0 - d))
        total = pg_loss + cfg.value_coef * v_loss - cfg.entropy_coef * ent
        if cfg.bounds_loss_coef:
            total = total + cfg.bounds_loss_coef * _bounds_loss(means)
        return total, (pg_loss, v_loss, ent, kl)

    def train_step(ts: TrainState, env_carry_ext, obs, key, norm):
        _, h0, _ = env_carry_ext
        (ts, (env_carry, h_last, done_last), obs, key, norm), traj = jax.lax.scan(
            env_step, (ts, env_carry_ext, obs, key, norm), None, length=T)
        (norm_obs_t, actions_t, logps_t, values_t, rewards_t, dones_t,
         terms_t, done_prev_t) = traj

        if cfg.normalize_obs:
            norm = RunningMeanStd.update(norm, norm_obs_t.reshape(N * T, -1))

        last_norm_obs = (RunningMeanStd.normalize(norm, obs)
                         if cfg.normalize_obs else obs)
        h_in = h_last * (1.0 - done_last)[:, None]
        _, _, last_value, _ = apply_net(ts.params, ts, last_norm_obs, h_in)
        if cfg.normalize_value:
            last_value = _v_unnormalize(norm, last_value)
        adv_t, ret_t = _gae(cfg.gamma, cfg.gae_lambda, values_t, rewards_t,
                            dones_t, last_value)
        values_st, ret_st = values_t, ret_t
        if cfg.normalize_value:
            norm = _vstats_update(norm, values_t)
            values_st = _v_normalize(norm, values_t)
            norm = _vstats_update(norm, ret_t)
            ret_st = _v_normalize(norm, ret_t)

        # pack sequences as contiguous per-env rows: (T, N, D) -> (N, T*D)
        obs_dim = norm_obs_t.shape[-1]
        act_dim = actions_t.shape[-1]
        col = lambda x: x[..., None]
        data3d = jnp.concatenate(
            [norm_obs_t, actions_t, col(logps_t), col(values_st), col(adv_t),
             col(ret_st), col(done_prev_t)], axis=-1)
        Dt = data3d.shape[-1]
        data_rows = jnp.swapaxes(data3d, 0, 1).reshape(N, T * Dt)

        def unpack(rows):
            x = rows.reshape(-1, T, Dt)
            o = x[..., :obs_dim]
            a = x[..., obs_dim:obs_dim + act_dim]
            rest = x[..., obs_dim + act_dim:]
            return (o, a, rest[..., 0], rest[..., 1], rest[..., 2],
                    rest[..., 3], rest[..., 4])

        def epoch(carry, _):
            ts, key = carry
            key, pkey = jax.random.split(key)
            perm = jax.random.permutation(pkey, N)
            shuffled = data_rows[perm]
            h0_perm = h0[perm]

            def minibatch(ts, i):
                rows = jax.lax.dynamic_slice_in_dim(
                    shuffled, i * mb_envs, mb_envs, axis=0)
                h0_mb = jax.lax.dynamic_slice_in_dim(
                    h0_perm, i * mb_envs, mb_envs, axis=0)
                mb = unpack(rows)
                if cfg.normalize_advantage:
                    adv = mb[4]
                    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
                    mb = mb[:4] + (adv,) + mb[5:]
                grads, aux = jax.grad(loss_fn, has_aux=True)(
                    ts.params, ts, mb, h0_mb)
                ts = ts.apply_gradients(grads=grads)
                return _adapt_lr(cfg, ts, aux[3]), aux

            ts, aux = jax.lax.scan(minibatch, ts, jnp.arange(n_minibatches))
            return (ts, key), aux

        (ts, key), aux = jax.lax.scan(epoch, (ts, key), None, length=cfg.epochs)
        metrics = _rollout_metrics(cfg, rewards_t, dones_t, terms_t,
                                   values_t, aux, ts)
        return ts, (env_carry, h_last, done_last), obs, key, norm, metrics

    return train_step


class PPOTrainer:
    """Host-side loop around the jitted train step (CleanRL-runner analog)."""

    def __init__(self, task, cfg: PPOConfig):
        self.task = task
        self.cfg = cfg
        obs_dim = task.task_config.observation_space_dim
        act_dim = task.task_config.action_space_dim

        key = jax.random.PRNGKey(cfg.seed)
        key, init_key = jax.random.split(key)
        if cfg.rnn == "gru":
            self.network = ActorCriticGRU(action_dim=act_dim,
                                          hidden=cfg.hidden,
                                          rnn_hidden=cfg.rnn_hidden,
                                          activation=cfg.activation)
            net_params = self.network.init(init_key, jnp.zeros((1, obs_dim)),
                                           jnp.zeros((1, cfg.rnn_hidden)))
        elif cfg.rnn is None:
            self.network = ActorCritic(action_dim=act_dim, hidden=cfg.hidden,
                                       activation=cfg.activation)
            net_params = self.network.init(init_key, jnp.zeros((1, obs_dim)))
        else:
            raise ValueError(f"unknown rnn type {cfg.rnn!r} (None or 'gru')")
        if cfg.lr_schedule == "adaptive":
            # lr lives in the optimizer STATE (inject_hyperparams) so the
            # jitted train step can move it per minibatch from the policy
            # KL — the reference trains with rl-games' adaptive scheduler
            # (ppo_aerial_quad.yaml:46-47)
            @optax.inject_hyperparams
            def _make_tx(learning_rate):
                return optax.chain(
                    optax.clip_by_global_norm(cfg.max_grad_norm),
                    optax.adam(learning_rate, eps=1e-5))

            tx = _make_tx(learning_rate=cfg.lr)
        elif cfg.lr_schedule == "fixed":
            tx = optax.chain(
                optax.clip_by_global_norm(cfg.max_grad_norm),
                optax.adam(cfg.lr, eps=1e-5),
            )
        else:
            raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                             f"('adaptive' or 'fixed')")
        self.train_state = TrainState.create(apply_fn=self.network.apply,
                                             params=net_params, tx=tx)
        self.norm = RunningMeanStd.init(obs_dim)
        # scalar running stats for value normalization (rl-games
        # value_mean_std); carried even when disabled so the norm pytree
        # structure is config-independent for checkpoints/sharding
        self.norm.update(v_mean=jnp.zeros((), jnp.float32),
                         v_var=jnp.ones((), jnp.float32),
                         v_count=jnp.asarray(1e-4, jnp.float32))
        self.key = key
        self._iter = 0  # next training iteration (elastic resume cursor)

        env_step_fn, self.env_carry, self.obs = task.make_step_fn()
        if cfg.rnn == "gru":
            # fold the policy hidden state + boundary mask into the env
            # carry: elastic checkpoints, shard_trainer and donation then
            # cover them with zero extra plumbing
            self.env_carry = (self.env_carry,
                              jnp.zeros((cfg.num_envs, cfg.rnn_hidden),
                                        jnp.float32),
                              jnp.zeros((cfg.num_envs,), jnp.float32))
            self.train_step_fn = make_train_step_rnn(env_step_fn, cfg)
        else:
            self.train_step_fn = make_train_step(env_step_fn, cfg)
        self._train_step = jax.jit(self.train_step_fn, donate_argnums=(1,))
        self._act_h = None  # recurrent act() hidden (play/deployment)

    def save_checkpoint(self, path: str):
        """Serialize network params + obs-normalizer state (reference analog:
        rl-games --checkpoint save, runner.py:202-206)."""
        import pickle

        from flax import serialization

        with open(path, "wb") as f:
            pickle.dump({
                "params": serialization.to_bytes(self.train_state.params),
                "norm": {k: np.asarray(v) for k, v in self.norm.items()},
                "cfg": self.cfg.__dict__,
                "obs_dim": int(self.task.task_config.observation_space_dim),
                "action_dim": int(self.task.task_config.action_space_dim),
            }, f)
        logger.info(f"checkpoint saved to {path}")

    def load_checkpoint(self, path: str):
        import pickle

        from flax import serialization

        with open(path, "rb") as f:
            blob = pickle.load(f)
        params = serialization.from_bytes(self.train_state.params,
                                          blob["params"])
        self.train_state = self.train_state.replace(params=params)
        self.norm = {k: jnp.asarray(v) for k, v in blob["norm"].items()}
        self._act_h = None  # stale hidden from the old params is meaningless
        logger.info(f"checkpoint loaded from {path}")

    def save_checkpoint_orbax(self, dir_path: str):
        """Orbax checkpoint of the learner pytree (SURVEY 5.4 build
        equivalent) — the multi-host-safe TPU-native format: every host
        participates in the save, arrays stream without a pickle round
        trip, and restore works across topologies."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(dir_path),
                   self._globalize(self._learner_bundle()), force=True)
        ckptr.wait_until_finished()
        logger.info(f"orbax checkpoint saved to {dir_path}")

    def load_checkpoint_orbax(self, dir_path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        try:
            restored = ckptr.restore(os.path.abspath(dir_path),
                                     self._globalize(self._learner_bundle()))
        except Exception as e:
            raise RuntimeError(_RESTORE_HINT) from e
        self.train_state = self.train_state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"])
        self.norm = restored["norm"]
        self._act_h = None  # stale hidden from the old params is meaningless
        logger.info(f"orbax checkpoint loaded from {dir_path}")

    # ---- elastic recovery (SURVEY 5.3 north-star scope) -------------------
    # The reference has no failure-recovery story at all; here a training
    # run is preemption-safe: the FULL training state — learner params +
    # optimizer + obs normalizer + env state pytree + PRNG key + iteration
    # counter — checkpoints atomically, and a restarted job (same or
    # different device topology) resumes exactly where it left off. Restore
    # re-lays-out every array to the restoring job's shardings, so a run
    # preempted on N chips can rejoin on M chips.

    def _learner_bundle(self):
        # single schema shared by the orbax learner checkpoints and the
        # elastic full-state checkpoints — add new learner fields HERE
        return {"params": self.train_state.params,
                "opt_state": self.train_state.opt_state,
                "step": self.train_state.step,
                "norm": dict(self.norm)}

    def _elastic_bundle(self):
        return {**self._learner_bundle(),
                "env_carry": self.env_carry,
                "obs": self.obs,
                "key": self.key,
                "iter": jnp.asarray(self._iter, jnp.int32)}

    @staticmethod
    def _pack_empty(tree):
        # orbax refuses zero-size arrays (e.g. obstacle_pos in obstacle-free
        # tasks); stand in a 1-element placeholder to keep the tree structure
        # identical across save/restore. Unpacked in restore_training_state.
        return jax.tree_util.tree_map(
            lambda x: jnp.zeros((1,), jnp.asarray(x).dtype)
            if np.size(x) == 0 else x, tree)

    @staticmethod
    def _globalize(tree):
        """Multi-process orbax requires every leaf to be a GLOBAL array:
        a process-local (fully-addressable) leaf — the iteration scalar,
        the zero-size placeholders, anything the user never sharded —
        cannot be serialized when other processes also save. Replicate
        such leaves over the global mesh; no-op in single-process runs."""
        if jax.process_count() <= 1:
            return tree
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        rep = NamedSharding(Mesh(np.asarray(jax.devices()), ("_r",)), P())

        def fix(x):
            if isinstance(x, jax.Array) and x.sharding.is_fully_addressable:
                host = np.asarray(jax.device_get(x))
                return jax.make_array_from_callback(
                    host.shape, rep, lambda idx, h=host: h[idx])
            return x

        return jax.tree_util.tree_map(fix, tree)

    def _elastic_manager(self, dir_path: str):
        import orbax.checkpoint as ocp

        # step-numbered checkpoints; the previous one is only garbage-
        # collected AFTER the new one commits, so a preemption mid-save can
        # never lose the run (keep 2 = current + the one being replaced)
        return ocp.CheckpointManager(
            os.path.abspath(dir_path),
            options=ocp.CheckpointManagerOptions(max_to_keep=2,
                                                 create=True))

    def save_training_state(self, dir_path: str):
        """Atomic full-training-state checkpoint (orbax; multi-host safe —
        every host participates and the directory commit is atomic; the
        previous checkpoint survives until the new one has committed)."""
        import orbax.checkpoint as ocp

        with self._elastic_manager(dir_path) as mgr:
            mgr.save(self._iter, args=ocp.args.StandardSave(
                self._globalize(self._pack_empty(self._elastic_bundle()))))
            mgr.wait_until_finished()
        logger.info(f"elastic checkpoint saved to {dir_path} "
                    f"(iter {self._iter})")

    def restore_training_state(self, dir_path: str) -> int:
        """Restore the latest full training state; returns the iteration to
        resume from (0 if no checkpoint exists yet). The current trainer's
        arrays serve as the restore target, so the checkpoint re-shards onto
        THIS job's mesh (elastic rejoin on a different host/chip count)."""
        import orbax.checkpoint as ocp

        bundle = self._elastic_bundle()
        with self._elastic_manager(dir_path) as mgr:
            latest = mgr.latest_step()
            if latest is None:
                logger.warning(f"no elastic checkpoint under {dir_path}; "
                               f"starting fresh")
                return 0
            try:
                restored = mgr.restore(latest, args=ocp.args.StandardRestore(
                    self._globalize(self._pack_empty(bundle))))
            except Exception as e:
                raise RuntimeError(_RESTORE_HINT) from e
        # zero-size leaves were saved as placeholders — keep ours instead
        restored = jax.tree_util.tree_map(
            lambda orig, r: orig if np.size(orig) == 0 else r,
            bundle, restored)
        self.train_state = self.train_state.replace(
            params=restored["params"], opt_state=restored["opt_state"],
            step=restored["step"])
        self.norm = restored["norm"]
        self.env_carry = restored["env_carry"]
        self.obs = restored["obs"]
        self.key = restored["key"]
        self._iter = int(restored["iter"])
        self._act_h = None  # stale hidden from the old params is meaningless
        logger.info(f"elastic checkpoint restored from {dir_path} "
                    f"(resuming at iter {self._iter})")
        return self._iter

    def reset_act_hidden(self, env_ids=None):
        """Reset the recurrent hidden state used by :meth:`act` — all envs,
        or just `env_ids` (call at episode boundaries during
        play/deployment; no-op for MLP). Vectorized callers that step envs
        with auto-reset should instead pass the previous step's dones to
        :meth:`act`, which does this masking automatically."""
        if env_ids is None:
            self._act_h = None
        elif self._act_h is not None:
            self._act_h = self._act_h.at[jnp.asarray(env_ids)].set(0.0)

    def act(self, obs, deterministic: bool = True, done_prev=None):
        """Policy inference (used by play mode + sim2real deployment).

        done_prev: optional (N,) 0/1 mask of envs that finished an episode
        on the PREVIOUS step. For the recurrent policy this zeroes those
        envs' hidden state before the forward pass — exactly the masking
        the rollout applies during training — so play/eval sees the same
        hidden-state distribution the policy was trained on.
        """
        norm_obs = (RunningMeanStd.normalize(self.norm, obs)
                    if self.cfg.normalize_obs else obs)
        if self.cfg.rnn == "gru":
            if self._act_h is None or self._act_h.shape[0] != obs.shape[0]:
                self._act_h = jnp.zeros((obs.shape[0], self.cfg.rnn_hidden),
                                        jnp.float32)
            elif done_prev is not None:
                self._act_h = self._act_h * (
                    1.0 - jnp.asarray(done_prev, jnp.float32))[:, None]
            mean, log_std, _, self._act_h = self.train_state.apply_fn(
                self.train_state.params, norm_obs, self._act_h)
        else:
            mean, log_std, _ = self.train_state.apply_fn(
                self.train_state.params, norm_obs)
        if deterministic:
            return mean
        self.key, akey = jax.random.split(self.key)
        action, _ = sample_action(mean, log_std, akey)
        return action

    def train(self, total_env_steps: Optional[int] = None, log_every: int = 10,
              logdir: Optional[str] = None, track: Optional[str] = None,
              ckpt_dir: Optional[str] = None, save_every: int = 0,
              resume: bool = False):
        """Run the training loop.

        logdir/track: optional TensorBoard+JSONL (and wandb) metrics sink —
        the reference analog of rl-games ``--track``/SummaryWriter
        (reference rl_training/cleanrl/ppo_continuous_action.py:327-343).

        ckpt_dir/save_every/resume: preemption-safe elastic training — the
        full training state checkpoints to ckpt_dir every `save_every`
        iterations (and at the end); `resume=True` restores from ckpt_dir
        if one exists and continues from the saved iteration, on whatever
        device topology THIS job has.
        """
        cfg = self.cfg
        total = total_env_steps or cfg.total_env_steps
        steps_per_iter = cfg.num_envs * cfg.horizon
        iters = max(total // steps_per_iter, 1)

        start_iter = 0
        if resume and ckpt_dir and os.path.isdir(ckpt_dir):
            start_iter = self.restore_training_state(ckpt_dir)
        if start_iter >= iters:
            logger.info(f"resume: checkpoint already at iter {start_iter} >= "
                        f"{iters} requested — nothing to train")
            return []
        last_saved = start_iter if start_iter else None

        obs = self.obs
        env_carry = self.env_carry

        from ..utils.metrics import MetricsWriter
        writer = MetricsWriter(logdir, track=track)

        history = []
        t_start = time.perf_counter()
        # Steady-state throughput reference point: set after the first
        # iteration returns, so the reported sps excludes the one-time XLA
        # compile (which otherwise dominates short runs with a cold
        # persistent-compilation cache).
        t_steady = None
        steps_steady = 0
        pending = None  # deferred (iter, device metrics)

        def _emit(it, metrics):
            # Completion-anchored timing: block on the (one-log-interval
            # old) stashed metrics BEFORE reading the clock. Dispatch-time
            # deltas are meaningless — the host can run many iterations
            # ahead of the device, which once inflated logged sps 4-40x.
            # The block throttles the host to at most one log interval of
            # lead, which preserves the pipelining that the deferral buys.
            jax.block_until_ready(metrics)
            now = time.perf_counter()
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            m["iter"] = it
            m["env_steps"] = (it + 1) * steps_per_iter
            m["wall_s"] = now - t_start
            # env_steps_per_s is the post-compile (steady-state) rate —
            # definition changed from cumulative in round 1 (PERF.md); the
            # cumulative rate is kept under its own key. The first log
            # point falls back to THIS-RUN steps over this-run wall (on
            # resume, env_steps includes pre-resume iterations).
            run_steps = m["env_steps"] - start_iter * steps_per_iter
            m["env_steps_per_s_cumulative"] = run_steps / max(m["wall_s"], 1e-9)
            dt = now - t_steady
            dsteps = m["env_steps"] - steps_steady
            m["env_steps_per_s"] = (dsteps / dt if dsteps > 0 and dt > 0
                                    else run_steps / max(m["wall_s"], 1e-9))
            history.append(m)
            writer.write(m["env_steps"], m)
            logger.info(
                f"it {it:4d} steps {m['env_steps']:.2e} "
                f"reward {m['reward_mean']:7.3f} crash {m['crash_rate']:.3f} "
                f"sps {m['env_steps_per_s']:.0f} wall {m['wall_s']:.1f}s")
        for it in range(start_iter, iters):
            (self.train_state, env_carry, obs, self.key, self.norm,
             metrics) = self._train_step(self.train_state, env_carry, obs,
                                         self.key, self.norm)
            if t_steady is None:
                jax.block_until_ready(metrics)
                t_steady = time.perf_counter()
                steps_steady = (it + 1) * steps_per_iter
            if ckpt_dir and save_every and (it + 1) % save_every == 0:
                self.env_carry, self.obs, self._iter = env_carry, obs, it + 1
                self.save_training_state(ckpt_dir)
                last_saved = it + 1
            if it % log_every == 0 or it == iters - 1:
                # Log WITHOUT stalling the device pipeline: fetching the
                # just-dispatched iteration's metrics blocks until it
                # finishes (one pipeline bubble per log point), and
                # per-scalar float() fetches are ~10 separate D2H round
                # trips — over a tunneled backend those cost more than the
                # train step itself (profiled: train() ran at 4.5M steps/s
                # vs 12.35M for the raw step; after batching 10.9M; with
                # this one-point-delayed emission ~raw-step rate;
                # scripts/profile_position_ppo.py). So each log point emits
                # the PREVIOUS log point's metrics (long completed by now,
                # so device_get returns without a sync) and stashes the
                # current device refs.
                if pending is not None:
                    _emit(*pending)
                pending = (it, metrics)
        if pending is not None:
            _emit(*pending)
        writer.close()
        self.env_carry = env_carry
        self.obs = obs
        self._iter = iters
        if ckpt_dir and save_every and last_saved != iters:
            self.save_training_state(ckpt_dir)
        if hasattr(self.task, "set_carry"):
            # the RNN path extends the env carry with (hidden, done_prev);
            # the task only owns the bare task carry
            self.task.set_carry(env_carry[0] if self.cfg.rnn else env_carry)
        return history


def enable_compilation_cache(path: str = None):
    """Persistent jit cache: repeat runs skip XLA compilation entirely.

    Defaults to the CPU-feature-fingerprinted dir (see
    aerial_gym_simulator_tpu.__init__._default_jit_cache_dir — stale
    foreign-machine CPU AOT entries segfault)."""
    if path is None:
        from .. import _default_jit_cache_dir
        path = _default_jit_cache_dir()
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # older jax versions
        logger.warning(f"compilation cache unavailable: {e}")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="position_setpoint_task")
    p.add_argument("--num_envs", type=int, default=8192)
    p.add_argument("--total_steps", type=int, default=50_000_000)
    p.add_argument("--horizon", type=int, default=32)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--multichip", action="store_true",
                   help="shard the env axis over all visible devices")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize before building the mesh")
    p.add_argument("--logdir", default=None,
                   help="write TensorBoard + metrics.jsonl here")
    p.add_argument("--vae_params", default=None,
                   help="frozen depth-VAE params (.pkl from models/"
                        "train_vae) for the navigation tasks")
    p.add_argument("--torch_vae", default=None,
                   help="reference-framework torch VAE .pth for the "
                        "navigation tasks (models/torch_vae_import)")
    p.add_argument("--track", default=None, choices=[None, "wandb"],
                   help="additionally stream metrics to wandb")
    p.add_argument("--ckpt_dir", default=None,
                   help="elastic-checkpoint directory (full training state)")
    p.add_argument("--save_every", type=int, default=50,
                   help="checkpoint every N iterations (with --ckpt_dir)")
    p.add_argument("--resume", action="store_true",
                   help="resume from --ckpt_dir if a checkpoint exists "
                        "(works across device topologies)")
    p.add_argument("--entropy_coef", type=float, default=0.0,
                   help="entropy bonus (the reference's sample-factory "
                        "lidar/radar configs use exploration_loss_coeff "
                        "0.001, train_aerialgym.py:218/238)")
    p.add_argument("--rnn", default=None, choices=[None, "gru"],
                   help="recurrent policy core (GRU actor-critic; the "
                        "reference needs external sample-factory for this)")
    p.add_argument("--rnn_hidden", type=int, default=256)
    p.add_argument("--save", default=None,
                   help="write the final learner checkpoint (pickle, the "
                        "load_checkpoint/export_policy_npz format) here")
    p.add_argument("--task_kv", action="append", default=[], metavar="K=V",
                   help="override a task-config attribute (value parsed as "
                        "a Python literal; plain strings pass through), "
                        "e.g. --task_kv radar_invalid_anneal_env_steps="
                        "150000000 — repeatable")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend before first device use (the axon TPU plugin ignores JAX_PLATFORMS=cpu; this flag is the reliable CPU-run switch)")
    args = p.parse_args()
    if args.cpu:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")

    # must run before ANY backend use — importing this package is kept free
    # of device-array creation precisely so this ordering works
    if args.multihost:
        from ..parallel.distributed import initialize_multihost
        initialize_multihost(require=True)

    import aerial_gym_simulator_tpu as ag

    enable_compilation_cache()

    task_config = None
    if args.vae_params or args.torch_vae:
        import dataclasses
        task_config = ag.task_registry.get_task_config(args.task)
        task_config = dataclasses.replace(
            task_config, vae_params_path=args.vae_params,
            torch_vae_path=args.torch_vae)
    if args.task_kv:
        import ast
        if task_config is None:
            task_config = ag.task_registry.get_task_config(args.task)
        for kv in args.task_kv:
            k, _, v = kv.partition("=")
            if not hasattr(task_config, k):
                p.error(f"--task_kv: task config has no attribute {k!r}")
            try:
                val = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                val = v   # plain string (e.g. a robot name)
            setattr(task_config, k, val)
    task = ag.task_registry.make_task(args.task, num_envs=args.num_envs,
                                      seed=args.seed, task_config=task_config)
    cfg = PPOConfig(num_envs=args.num_envs, horizon=args.horizon,
                    minibatch_size=min(8192, args.num_envs * args.horizon),
                    total_env_steps=args.total_steps, seed=args.seed,
                    entropy_coef=args.entropy_coef,
                    rnn=args.rnn, rnn_hidden=args.rnn_hidden)
    trainer = PPOTrainer(task, cfg)
    if args.multichip or args.multihost:
        from ..parallel.distributed import shard_trainer
        shard_trainer(trainer)
    history = trainer.train(logdir=args.logdir, track=args.track,
                            ckpt_dir=args.ckpt_dir,
                            save_every=args.save_every, resume=args.resume)
    if args.save:
        trainer.save_checkpoint(args.save)
    if not history:
        print("nothing to train (resumed checkpoint already complete)")
        return
    print(f"final reward: {history[-1]['reward_mean']:.3f} "
          f"({history[-1]['wall_s']:.1f}s wall)")


if __name__ == "__main__":
    main()
