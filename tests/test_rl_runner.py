"""YAML runner config mapping + vec-env wrappers."""

import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl_training.rl_games.runner import (
    CONFIG_DIR,
    load_yaml_config,
    ppo_config_from_yaml,
)
from aerial_gym_simulator_tpu.rl_training.vec_env import (
    AerialGymVecEnv,
    ExtractObsWrapper,
)
import os


def test_yaml_maps_reference_layout():
    doc = load_yaml_config(os.path.join(CONFIG_DIR, "ppo_aerial_quad.yaml"))
    cfg = ppo_config_from_yaml(doc)
    assert cfg.num_envs == 8192
    assert cfg.horizon == 32
    assert cfg.minibatch_size == 8192
    assert cfg.epochs == 4
    assert cfg.gamma == 0.99
    assert cfg.gae_lambda == 0.95
    assert cfg.lr == 1e-4
    assert cfg.value_coef == 2.0
    assert cfg.reward_scale == 0.1
    assert cfg.hidden == (256, 128, 64)
    assert cfg.activation == "elu"
    assert cfg.seed == 8

    # CLI overrides win
    cfg2 = ppo_config_from_yaml(doc, num_envs=64, seed=5)
    assert cfg2.num_envs == 64 and cfg2.seed == 5
    assert cfg2.minibatch_size <= 64 * 32


def test_reference_yaml_loads_through_our_mapper():
    """A migrating user's unmodified REFERENCE yaml maps onto our PPOConfig
    with the same hyperparameters (differential vs the reference's own
    shipped ppo_aerial_quad.yaml)."""
    ref_yaml = "/root/reference/aerial_gym/rl_training/rl_games/ppo_aerial_quad.yaml"
    if not os.path.exists(ref_yaml):
        import pytest
        pytest.skip("reference checkout not present")
    doc = load_yaml_config(ref_yaml)
    cfg = ppo_config_from_yaml(doc)
    c = doc["params"]["config"]
    # the reference yaml ships BOTH env_config.num_envs=8192 and
    # num_actors=4096; the reference runner creates envs from
    # env_config.num_envs (runner.py:298), which our mapper mirrors
    assert cfg.num_envs == c["env_config"]["num_envs"] == 8192
    assert c["num_actors"] == 4096
    assert cfg.horizon == c["horizon_length"] == 32
    assert cfg.minibatch_size == c["minibatch_size"] == 8192
    assert cfg.epochs == c["mini_epochs"]
    assert cfg.gamma == c["gamma"]
    assert cfg.lr == float(c["learning_rate"])
    assert cfg.kl_threshold == c["kl_threshold"]
    assert cfg.lr_schedule == "adaptive" and c["lr_schedule"] == "adaptive"
    assert cfg.value_bootstrap == c["value_bootstrap"]
    assert cfg.normalize_value == c["normalize_value"]
    assert cfg.bounds_loss_coef == c["bounds_loss_coef"]
    assert tuple(cfg.hidden) == tuple(doc["params"]["network"]["mlp"]["units"])
    # and the shipped default task matches the reference's
    assert c["env_name"] == "position_setpoint_task_sim2real"
    ours = load_yaml_config(os.path.join(CONFIG_DIR, "ppo_aerial_quad.yaml"))
    assert ours["params"]["config"]["env_name"] == c["env_name"]


def test_reference_navigation_yaml_loads_through_our_mapper():
    """The reference's navigation yaml (recurrent GRU policy) maps onto
    PPOConfig with the same hyperparameters and the rnn section engaged."""
    ref_yaml = ("/root/reference/aerial_gym/rl_training/rl_games/"
                "ppo_aerial_quad_navigation.yaml")
    if not os.path.exists(ref_yaml):
        import pytest
        pytest.skip("reference checkout not present")
    doc = load_yaml_config(ref_yaml)
    cfg = ppo_config_from_yaml(doc)
    c = doc["params"]["config"]
    rnn = doc["params"]["network"]["rnn"]
    assert cfg.rnn == "gru" and rnn["name"] == "gru"
    assert cfg.rnn_hidden == rnn["units"]
    assert cfg.num_envs == c["env_config"]["num_envs"]
    assert cfg.gamma == c["gamma"]
    assert cfg.lr == float(c["learning_rate"])
    assert tuple(cfg.hidden) == tuple(doc["params"]["network"]["mlp"]["units"])


def test_extract_obs_wrapper():
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=4,
                                      seed=0)
    env = ExtractObsWrapper(task)
    obs = env.reset()
    assert obs.shape == (4, 13)
    obs, rew, dones, infos = env.step(jnp.zeros((4, 4)))
    assert obs.shape == (4, 13) and rew.shape == (4,) and dones.shape == (4,)


def test_sample_factory_vec_env_numpy_interface():
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=4,
                                      seed=0)
    env = AerialGymVecEnv(task)
    obs, info = env.reset()
    assert isinstance(obs["obs"], np.ndarray)
    obs, rew, term, trunc, infos = env.step(np.zeros((4, 4), np.float32))
    assert isinstance(rew, np.ndarray) and rew.shape == (4,)


def test_metrics_writer_jsonl_and_tensorboard(tmp_path):
    """MetricsWriter (SURVEY section 5.5 parity): scalars fan out to
    metrics.jsonl and TensorBoard event files."""
    import json
    from aerial_gym_simulator_tpu.utils.metrics import MetricsWriter

    d = str(tmp_path / "run")
    with MetricsWriter(d) as w:
        w.write(100, {"reward_mean": 1.5, "crash_rate": 0.0})
        w.write(200, {"reward_mean": 2.5, "crash_rate": 0.1})
    lines = [json.loads(l) for l in open(d + "/metrics.jsonl")]
    assert lines[0] == {"step": 100, "reward_mean": 1.5, "crash_rate": 0.0}
    assert lines[1]["reward_mean"] == 2.5
    import os
    assert any(f.startswith("events.out.tfevents") for f in os.listdir(d))
    # disabled writer is a no-op
    w2 = MetricsWriter(None)
    w2.write(1, {"x": 1.0})
    w2.close()


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax learner checkpoint (SURVEY section 5.4): save -> perturb ->
    restore reproduces params, optimizer state and obs-normalizer."""
    import jax
    import jax.numpy as jnp

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    tr = PPOTrainer(task, PPOConfig(num_envs=8, horizon=4, minibatch_size=32,
                                    seed=0))
    obs = np.random.RandomState(0).randn(3, 13).astype(np.float32)
    a_before = np.asarray(tr.act(jnp.asarray(obs)))
    d = str(tmp_path / "orbax_ckpt")
    tr.save_checkpoint_orbax(d)

    # perturb the live state, then restore
    tr.train_state = tr.train_state.replace(
        params=jax.tree.map(lambda x: x + 1.0, tr.train_state.params))
    assert not np.allclose(np.asarray(tr.act(jnp.asarray(obs))), a_before)
    tr.load_checkpoint_orbax(d)
    np.testing.assert_allclose(np.asarray(tr.act(jnp.asarray(obs))),
                               a_before, atol=1e-6)


def test_ppo_learns_synthetic_bandit():
    """Learning regression (SURVEY section 4 implication): the fused PPO
    machinery (rollout scan + GAE + clipped update) must actually improve
    a policy. A trivial continuous bandit (reward = -|a - 0.5|) converges
    in a few hundred iterations on CPU; a broken update (sign error, bad
    advantage normalization, stale logp) fails this immediately."""
    import jax
    import jax.numpy as jnp
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

    N, obs_dim, act_dim = 64, 4, 2
    target = jnp.array([0.5, -0.3])

    class BanditTask:
        class task_config:
            observation_space_dim = obs_dim
            action_space_dim = act_dim

        def make_step_fn(self):
            def step(carry, action):
                # carry and obs must be distinct buffers (the trainer
                # donates the carry, like the real tasks' SimState)
                carry = carry + 1
                obs = jnp.zeros((N, obs_dim)) + 0.0 * carry.astype(jnp.float32)
                reward = -jnp.abs(action - target[None, :]).sum(-1)
                term = jnp.zeros((N,), jnp.float32)
                return carry, obs, reward, term, term
            return step, jnp.zeros((), jnp.int32), jnp.zeros((N, obs_dim))

    cfg = PPOConfig(num_envs=N, horizon=8, minibatch_size=128, epochs=4,
                    lr=3e-3, gamma=0.0, gae_lambda=0.0, seed=0,
                    normalize_obs=False, reward_scale=1.0,
                    total_env_steps=N * 8 * 300)
    tr = PPOTrainer(BanditTask(), cfg)
    hist = tr.train(log_every=50)
    first, last = hist[0]["reward_mean"], hist[-1]["reward_mean"]
    assert last > first + 0.3, (first, last)
    # deterministic action approaches the bandit target
    a = np.asarray(tr.act(jnp.zeros((1, obs_dim))))
    np.testing.assert_allclose(a[0], np.asarray(target), atol=0.15)


def test_adaptive_lr_scheduler_moves_lr():
    """rl-games AdaptiveScheduler parity (reference ppo_aerial_quad.yaml
    lr_schedule: adaptive): lr shrinks 1.5x above 2x kl_threshold, grows
    1.5x below threshold/2, stays inside the band, clamps at the limits."""
    import jax.numpy as jnp

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import (PPOConfig, PPOTrainer,
                                                 _adapt_lr, _current_lr)

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=4,
                                      seed=0)
    cfg = PPOConfig(num_envs=4, horizon=4, minibatch_size=16, seed=0)
    tr = PPOTrainer(task, cfg)
    ts = tr.train_state
    close = lambda a, b: np.isclose(a, b, rtol=1e-6)
    lr0 = float(_current_lr(cfg, ts))
    assert close(lr0, cfg.lr)

    high = _adapt_lr(cfg, ts, jnp.asarray(10.0 * cfg.kl_threshold))
    assert close(float(_current_lr(cfg, high)), lr0 / 1.5)
    low = _adapt_lr(cfg, ts, jnp.asarray(0.1 * cfg.kl_threshold))
    assert close(float(_current_lr(cfg, low)), lr0 * 1.5)
    mid = _adapt_lr(cfg, ts, jnp.asarray(cfg.kl_threshold))
    assert close(float(_current_lr(cfg, mid)), lr0)

    # clamps
    t = ts
    for _ in range(40):
        t = _adapt_lr(cfg, t, jnp.asarray(1.0))
    assert close(float(_current_lr(cfg, t)), cfg.min_lr)
    t = ts
    for _ in range(40):
        t = _adapt_lr(cfg, t, jnp.asarray(0.0))
    assert close(float(_current_lr(cfg, t)), cfg.max_lr)

    # fixed schedule is untouched by _adapt_lr
    fixed_cfg = PPOConfig(num_envs=4, horizon=4, minibatch_size=16, seed=0,
                          lr_schedule="fixed")
    tr2 = PPOTrainer(task, fixed_cfg)
    same = _adapt_lr(fixed_cfg, tr2.train_state, jnp.asarray(1.0))
    assert same is tr2.train_state


def test_ppo_learns_with_value_normalization_and_bootstrap():
    """rl-games parity knobs (ppo_aerial_quad.yaml: normalize_value,
    value_bootstrap, bounds_loss_coef) must not break learning. The bandit
    env truncates every 4 steps so the time_outs bootstrap path is
    actually exercised, and rewards are scaled up so the value running
    stats do real work."""
    import jax.numpy as jnp
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

    N, obs_dim, act_dim = 64, 4, 2
    target = jnp.array([0.4, -0.2])

    class BanditTask:
        class task_config:
            observation_space_dim = obs_dim
            action_space_dim = act_dim

        def make_step_fn(self):
            def step(carry, action):
                carry = carry + 1
                obs = jnp.zeros((N, obs_dim)) + 0.0 * carry.astype(jnp.float32)
                reward = 10.0 * -jnp.abs(action - target[None, :]).sum(-1)
                term = jnp.zeros((N,), jnp.float32)
                trunc = jnp.full((N,), (carry % 4 == 0), jnp.float32)
                return carry, obs, reward, term, trunc
            return step, jnp.zeros((), jnp.int32), jnp.zeros((N, obs_dim))

    cfg = PPOConfig(num_envs=N, horizon=8, minibatch_size=128, epochs=4,
                    lr=3e-3, gamma=0.9, gae_lambda=0.95, seed=3,
                    normalize_obs=False, reward_scale=0.1,
                    normalize_value=True, value_bootstrap=True,
                    bounds_loss_coef=1e-4,
                    total_env_steps=N * 8 * 300)
    tr = PPOTrainer(BanditTask(), cfg)
    hist = tr.train(log_every=50)
    first, last = hist[0]["reward_mean"], hist[-1]["reward_mean"]
    assert last > first + 0.2, (first, last)
    a = np.asarray(tr.act(jnp.zeros((1, obs_dim))))
    np.testing.assert_allclose(a[0], np.asarray(target), atol=0.15)
