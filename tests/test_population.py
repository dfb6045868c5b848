"""Population training (rl/population.py): K PPO learners in one vmapped
program — member numerics vs a standalone PPOTrainer, per-member lr
populations, population-axis sharding on the virtual mesh, and the
pick-best-and-deploy checkpoint path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.population import PopulationTrainer
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

CFG = dict(num_envs=8, horizon=4, minibatch_size=32, epochs=2, seed=3)


def _factory(s):
    return ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=s)


def test_population_member_matches_standalone_trainer():
    """Member 0 of a 2-member population reproduces a standalone
    PPOTrainer run with the same seed bit-for-bit (same params after two
    train iterations)."""
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2)
    pop.train(total_env_steps=2 * 8 * 4, log_every=1)

    solo = PPOTrainer(_factory(3), dataclasses.replace(cfg, seed=3))
    solo.train(total_env_steps=2 * 8 * 4, log_every=1)

    pop_p0 = jax.tree_util.tree_map(lambda x: np.asarray(x[0]),
                                    pop.train_state.params)
    solo_p = jax.tree_util.tree_map(np.asarray, solo.train_state.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6), pop_p0,
        solo_p)
    # members with different seeds actually diverged
    pop_p1 = jax.tree_util.tree_map(lambda x: np.asarray(x[1]),
                                    pop.train_state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), pop_p0, pop_p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


def test_population_member_lrs_and_best_checkpoint(tmp_path):
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2,
                            member_lrs=[1e-4, 1e-3])
    lrs = np.asarray(
        pop.train_state.opt_state.hyperparams["learning_rate"])
    np.testing.assert_allclose(lrs, [1e-4, 1e-3])
    hist = pop.train(total_env_steps=2 * 8 * 4, log_every=1)
    assert hist[-1]["reward_mean"].shape == (2,)

    best = pop.best_member()
    ckpt = str(tmp_path / "best.ckpt")
    pop.member_checkpoint(best, ckpt)
    # the exported member loads as a standard checkpoint and acts
    solo = PPOTrainer(_factory(0), cfg)
    solo.load_checkpoint(ckpt)
    obs = jnp.zeros((4, 13), jnp.float32)
    a_solo = np.asarray(solo.act(obs, deterministic=True))
    # and matches the population member's own actor output
    norm_obs = jnp.clip(
        (obs - pop.norm["mean"][best])
        / jnp.sqrt(pop.norm["var"][best] + 1e-8), -5.0, 5.0)
    params_b = jax.tree_util.tree_map(lambda x: x[best],
                                      pop.train_state.params)
    mean, _, _ = pop.network.apply(params_b, norm_obs)
    np.testing.assert_allclose(a_solo, np.asarray(mean), atol=1e-6)


def test_pbt_step_exploits_and_explores():
    """The PBT exploit/explore: the worst member takes on the best member's
    learner state; its lr is perturbed within [min_lr, max_lr]; env state
    and PRNG stream stay its own."""
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2,
                            member_lrs=[2e-4, 8e-4])
    key_before = np.asarray(pop.key)
    carry_leaf_before = np.asarray(
        jax.tree_util.tree_leaves(pop.env_carry)[0])
    events = pop._pbt_step(np.array([1.0, 0.0]),
                           np.random.default_rng(0))  # member 1 is worst
    assert events and events[0][:2] == (1, 0)
    p0 = jax.tree_util.tree_map(lambda x: np.asarray(x[0]),
                                pop.train_state.params)
    p1 = jax.tree_util.tree_map(lambda x: np.asarray(x[1]),
                                pop.train_state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p1)
    lrs = np.asarray(pop.train_state.opt_state.hyperparams["learning_rate"])
    assert lrs[0] == pytest.approx(2e-4)           # winner untouched
    assert lrs[1] == pytest.approx(2e-4 * events[0][2])  # copied + perturbed
    np.testing.assert_array_equal(np.asarray(pop.key), key_before)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(pop.env_carry)[0]),
        carry_leaf_before)
    # training continues after a pbt step (state still vmappable)
    pop.train(total_env_steps=8 * 4, log_every=1)


def test_population_train_with_pbt_runs():
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2)
    hist = pop.train(total_env_steps=3 * 8 * 4, log_every=1, pbt_every=1)
    assert np.isfinite(hist[-1]["reward_mean"]).all()


def test_population_member_lrs_require_adaptive_schedule():
    cfg = PPOConfig(**CFG, lr_schedule="fixed")
    with pytest.raises(ValueError, match="adaptive"):
        PopulationTrainer(_factory, cfg, num_seeds=2, member_lrs=[1e-4, 1e-3])


def test_pbt_validates_schedule_and_fraction():
    cfg = PPOConfig(**CFG, lr_schedule="fixed")
    pop = PopulationTrainer(_factory, cfg, num_seeds=2)
    with pytest.raises(ValueError, match="adaptive"):
        pop._pbt_step(np.array([1.0, 0.0]), np.random.default_rng(0))
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2)
    with pytest.raises(ValueError, match="0.5"):
        pop._pbt_step(np.array([1.0, 0.0]), np.random.default_rng(0),
                      fraction=0.75)


def test_population_shards_over_virtual_mesh():
    """Population axis sharded over the 8-device virtual mesh (conftest
    forces xla_force_host_platform_device_count=8): runs and stays finite;
    per-member results equal the unsharded run."""
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device virtual mesh")
    n_dev = jax.device_count()
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=n_dev)
    ref = PopulationTrainer(_factory, cfg, num_seeds=n_dev)
    pop.shard()
    pop.train(total_env_steps=2 * 8 * 4, log_every=1)
    ref.train(total_env_steps=2 * 8 * 4, log_every=1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        pop.train_state.params, ref.train_state.params)
    r = pop.last_metrics["reward_mean"]
    assert np.isfinite(r).all() and r.shape == (n_dev,)


def test_population_2d_mesh_matches_unsharded():
    """2-D (pop x env) mesh: each member's env batch shards over the inner
    axis; results equal the unsharded run."""
    if jax.device_count() < 4:
        pytest.skip("needs >= 4 virtual devices")
    env_dev = jax.device_count() // 2
    cfg = PPOConfig(**CFG)  # num_envs=8 divisible by env_dev (2 or 4)
    pop = PopulationTrainer(_factory, cfg, num_seeds=2)
    ref = PopulationTrainer(_factory, cfg, num_seeds=2)
    pop.shard(env_devices=env_dev)
    pop.train(total_env_steps=2 * 8 * 4, log_every=1)
    ref.train(total_env_steps=2 * 8 * 4, log_every=1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5),
        pop.train_state.params, ref.train_state.params)


def test_population_shard_rejects_indivisible():
    if jax.device_count() < 2:
        pytest.skip("needs the multi-device virtual mesh")
    cfg = PPOConfig(**CFG)
    pop = PopulationTrainer(_factory, cfg, num_seeds=jax.device_count() + 1)
    with pytest.raises(ValueError, match="multiple of"):
        pop.shard()
