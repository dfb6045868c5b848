"""Recurrent (GRU) PPO — native capability the reference only gets through
the external sample-factory stack (reference rl_training/sample_factory/
aerialgym_examples/train_aerialgym.py; its GRU policies appear here
otherwise only as imported checkpoints, sim2real/torch_import.py).

The key test is a MEMORY bandit: reward depends on the previous step's
observation, so a memoryless MLP mathematically cannot exceed the
median-action baseline while the GRU can — passing proves the hidden state
actually carries information through rollout AND through the sequence
replay in the PPO update.
"""

import jax
import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

N, OBS_DIM = 64, 2


class MemoryBanditTask:
    """reward_t = -|a_t - cue_{t-1}|; cue is iid uniform(-1,1) shown in obs.

    Best memoryless policy: a = median(cue) = 0 -> E[reward] = -0.5.
    A working GRU copies cue_{t-1} from its hidden state -> reward ~ 0.
    """

    class task_config:
        observation_space_dim = OBS_DIM
        action_space_dim = 1

    def make_step_fn(self):
        def step(carry, action):
            key, prev_cue = carry
            key, k = jax.random.split(key)
            reward = -jnp.abs(action[:, 0] - prev_cue)
            cue = jax.random.uniform(k, (N,), minval=-1.0, maxval=1.0)
            obs = jnp.stack([cue, jnp.zeros_like(cue)], axis=1)
            term = jnp.zeros((N,), jnp.float32)
            return (key, cue), obs, reward, term, term

        key = jax.random.PRNGKey(7)
        carry = (key, jnp.zeros((N,), jnp.float32))
        obs = jnp.zeros((N, OBS_DIM))
        return step, carry, obs


def test_gru_ppo_learns_memory_bandit():
    cfg = PPOConfig(num_envs=N, horizon=16, minibatch_size=256, epochs=4,
                    lr=3e-3, gamma=0.0, gae_lambda=0.0, seed=0,
                    normalize_obs=False, reward_scale=1.0,
                    rnn="gru", rnn_hidden=32, hidden=(32,),
                    total_env_steps=N * 16 * 400)
    tr = PPOTrainer(MemoryBanditTask(), cfg)
    hist = tr.train(log_every=50)
    last = hist[-1]["reward_mean"]
    # memoryless optimum is -0.5; require clearly beating it
    assert last > -0.3, f"GRU failed to use memory: reward {last}"


def test_gru_act_is_stateful_and_resettable():
    cfg = PPOConfig(num_envs=N, horizon=8, minibatch_size=128, epochs=1,
                    seed=1, normalize_obs=False, rnn="gru", rnn_hidden=16,
                    hidden=(16,), total_env_steps=N * 8)
    tr = PPOTrainer(MemoryBanditTask(), cfg)
    obs = jnp.ones((3, OBS_DIM))
    a1 = np.asarray(tr.act(obs))
    a2 = np.asarray(tr.act(obs))  # hidden evolved -> different output
    assert not np.array_equal(a1, a2)
    tr.reset_act_hidden()
    a3 = np.asarray(tr.act(obs))
    np.testing.assert_array_equal(a1, a3)

    # per-env episode-boundary masking: done_prev zeroes ONLY those envs'
    # hidden, reproducing the rollout's train-time masking at play time
    tr.reset_act_hidden()
    np.asarray(tr.act(obs))
    a_mask = np.asarray(tr.act(obs, done_prev=jnp.array([1.0, 0.0, 0.0])))
    tr.reset_act_hidden()
    fresh = np.asarray(tr.act(obs))  # env 0's hidden was zeroed -> as fresh
    np.testing.assert_array_equal(a_mask[0], fresh[0])
    assert not np.array_equal(a_mask[1], fresh[1])

    # per-env reset_act_hidden(env_ids) matches the done_prev path
    tr.reset_act_hidden()
    np.asarray(tr.act(obs))
    tr.reset_act_hidden(env_ids=[0])
    a_ids = np.asarray(tr.act(obs))
    np.testing.assert_array_equal(a_ids[0], fresh[0])
    assert not np.array_equal(a_ids[1], fresh[1])


def test_gru_ppo_trains_real_task_and_resumes(tmp_path):
    """GRU PPO on the position task: compiles, runs, and the elastic
    checkpoint covers the hidden state (exact same-topology resume)."""
    n, horizon = 16, 8
    spi = n * horizon

    def make():
        task = ag.task_registry.make_task("position_setpoint_task",
                                          num_envs=n, seed=2)
        task.reset()
        cfg = PPOConfig(num_envs=n, horizon=horizon, minibatch_size=spi,
                        epochs=2, seed=2, rnn="gru", rnn_hidden=32,
                        hidden=(32,))
        return PPOTrainer(task, cfg)

    ckpt = str(tmp_path / "gru_elastic")

    straight = make()
    h1 = straight.train(total_env_steps=4 * spi)
    assert np.isfinite(h1[-1]["reward_mean"])
    # train() hands the BARE task carry back to the task (not the
    # RNN-extended tuple): the task must remain usable afterwards
    obs, rew, term, trunc, _ = straight.task.step(
        jnp.zeros((n, straight.task.task_config.action_space_dim)))
    assert np.isfinite(np.asarray(rew)).all()

    victim = make()
    victim.train(total_env_steps=2 * spi, ckpt_dir=ckpt, save_every=2)
    del victim

    resumed = make()
    resumed.train(total_env_steps=4 * spi, ckpt_dir=ckpt, save_every=4,
                  resume=True)

    flat = lambda t: np.concatenate(
        [np.asarray(x).ravel()
         for x in jax.tree_util.tree_leaves(t.train_state.params)])
    np.testing.assert_array_equal(flat(straight), flat(resumed))
    # the resumed GRU hidden equals the straight run's hidden too
    np.testing.assert_array_equal(np.asarray(straight.env_carry[1]),
                                  np.asarray(resumed.env_carry[1]))
