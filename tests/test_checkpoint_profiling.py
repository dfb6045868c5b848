"""Sim-state checkpointing + profiling utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.utils.checkpoint import load_state, save_state
from aerial_gym_simulator_tpu.utils.profiling import Stopwatch, measure_steps


def test_sim_state_checkpoint_resume_exact(tmp_path):
    """Saving and restoring SimState reproduces trajectories exactly
    (RNG keys are part of the state)."""
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=2)
    task.reset()
    a = jnp.full((8, 4), 0.2, jnp.float32)
    for _ in range(3):
        task.step(a)

    path = str(tmp_path / "sim.ckpt")
    save_state(path, task.state)

    # branch A: continue
    for _ in range(5):
        task.step(a)
    pos_a = np.asarray(task.state.pos)

    # branch B: restore and replay
    task.sim_env.state = load_state(path, like=task.state)
    for _ in range(5):
        task.step(a)
    pos_b = np.asarray(task.state.pos)

    np.testing.assert_allclose(pos_a, pos_b, atol=1e-6)


def test_checkpoint_structure_validation(tmp_path):
    path = str(tmp_path / "x.ckpt")
    save_state(path, {"a": jnp.zeros((3,))})
    with pytest.raises(ValueError):
        load_state(path, like={"a": jnp.zeros((4,))})


def test_stopwatch_and_measure():
    sw = Stopwatch()
    with sw.phase("work"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        sw.fence(x)
    assert "work" in sw.report()

    task = ag.task_registry.make_task("position_setpoint_task", num_envs=8,
                                      seed=0)
    task.reset()
    step_fn, carry, obs = task.make_step_fn()
    import jax
    jitted = jax.jit(lambda s, a: step_fn(s, a)[0])
    out = measure_steps(jitted, carry, jnp.zeros((8, 4)), steps=5, warmup=2,
                        fence=lambda s: s.pos)
    assert out["env_steps_per_s"] > 0
