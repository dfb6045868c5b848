"""Elastic / preemption-safe training (SURVEY 5.3 north-star scope).

The reference has no failure-recovery story (SURVEY.md section 5.3: "None
in the infrastructure sense"); here a PPO run checkpoints its FULL training
state (learner + optimizer + obs normalizer + env state pytree + PRNG key +
iteration cursor) and a restarted job resumes exactly — including on a
different device topology (the virtual-mesh analog of losing/gaining TPU
hosts).
"""

import jax
import jax.numpy as jnp
import numpy as np

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

N_ENVS, HORIZON = 32, 8
STEPS_PER_ITER = N_ENVS * HORIZON


def _make_trainer(seed=3):
    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=N_ENVS, seed=seed)
    task.reset()
    cfg = PPOConfig(num_envs=N_ENVS, horizon=HORIZON,
                    minibatch_size=STEPS_PER_ITER, epochs=2, seed=seed)
    return PPOTrainer(task, cfg)


def _params_flat(trainer):
    return np.concatenate([np.asarray(x).ravel() for x in
                           jax.tree_util.tree_leaves(trainer.train_state.params)])


def test_elastic_resume_is_exact(tmp_path):
    """kill-after-2-iters + resume == uninterrupted 4-iter run, bit-exact
    (everything that evolves during training is inside the checkpoint)."""
    ckpt = str(tmp_path / "elastic")

    straight = _make_trainer()
    straight.train(total_env_steps=4 * STEPS_PER_ITER)

    victim = _make_trainer()
    victim.train(total_env_steps=2 * STEPS_PER_ITER,
                 ckpt_dir=ckpt, save_every=2)
    del victim  # the "preemption"

    resumed = _make_trainer()
    resumed.train(total_env_steps=4 * STEPS_PER_ITER,
                  ckpt_dir=ckpt, save_every=4, resume=True)

    np.testing.assert_array_equal(_params_flat(straight), _params_flat(resumed))
    np.testing.assert_array_equal(np.asarray(straight.key),
                                  np.asarray(resumed.key))
    np.testing.assert_allclose(np.asarray(straight.norm["count"]),
                               np.asarray(resumed.norm["count"]))


def test_sim_state_checkpoint_exact_replay(tmp_path):
    """EnvManager.save_state/load_state (SURVEY 5.4: the reference never
    checkpoints sim state): reload mid-trajectory and the continuation is
    bit-exact, including the host-side substep RNG."""
    import jax.numpy as jnp

    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=16, seed=11)
    task.reset()
    env = task.sim_env
    actions = jnp.full((16, 4), 0.1, jnp.float32)
    for _ in range(5):
        env.step(actions)
    path = str(tmp_path / "sim_state.npz")
    env.save_state(path)

    for _ in range(7):
        env.step(actions)
    pos_a = np.asarray(env.state.pos)
    steps_a = env.step_counter

    env.load_state(path)
    for _ in range(7):
        env.step(actions)
    np.testing.assert_array_equal(np.asarray(env.state.pos), pos_a)
    assert env.step_counter == steps_a


def test_sim_state_checkpoint_replays_sensor_noise(tmp_path):
    """save_state/load_state also restore the render-path key stream, so
    noisy sensor captures replay exactly (not just the dynamics)."""
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control", num_envs=2, seed=1)
    actions = jnp.zeros((2, 4), jnp.float32)
    env.step(actions)
    env.render()                      # consumes one render key
    path = str(tmp_path / "cam_state.npz")
    env.save_state(path)

    f1 = np.asarray(env.render()).copy()
    f2 = np.asarray(env.render()).copy()

    env.load_state(path)
    assert env._sensor_frames is None  # stale frames dropped
    np.testing.assert_array_equal(np.asarray(env.render()), f1)
    np.testing.assert_array_equal(np.asarray(env.render()), f2)


def test_elastic_rejoin_on_different_topology(tmp_path):
    """A run preempted on 8 devices rejoins on 4: restore re-shards every
    array to the new mesh and training continues."""
    from aerial_gym_simulator_tpu.parallel.distributed import shard_trainer

    ckpt = str(tmp_path / "elastic8")

    t8 = _make_trainer(seed=5)
    shard_trainer(t8, 8)
    t8.train(total_env_steps=2 * STEPS_PER_ITER, ckpt_dir=ckpt, save_every=2)
    saved_params = _params_flat(t8)

    t4 = _make_trainer(seed=5)
    shard_trainer(t4, 4)
    start = t4.restore_training_state(ckpt)
    assert start == 2
    # restore is exact regardless of topology
    np.testing.assert_array_equal(_params_flat(t4), saved_params)
    # env state landed on the 4-device mesh
    dev_count = len(t4.env_carry.pos.sharding.device_set)
    assert dev_count == 4
    # and training continues producing finite numbers
    hist = t4.train(total_env_steps=3 * STEPS_PER_ITER,
                    ckpt_dir=ckpt, save_every=0, resume=False)
    assert np.isfinite(hist[-1]["reward_mean"])
