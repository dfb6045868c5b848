"""First-order (BPTT) policy optimization — learning regression.

Verifies the analytic-policy-gradient trainer (rl/bptt.py) actually
learns through the simulator: gradients through env_step must be finite
and the smoothed TASK reward must improve substantially over the
untrained policy within a small env-step budget.
"""

import numpy as np

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl.bptt import BPTTConfig, BPTTTrainer


def test_bptt_learns_position_task():
    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=128, seed=0)
    cfg = BPTTConfig(num_envs=128, horizon=12, iters=800, lr=2e-3, seed=0)
    trainer = BPTTTrainer(task, cfg)
    hist = trainer.train(log_every=100)

    r0 = hist[0]["task_reward"]
    best_ema = trainer.best_ema
    assert np.isfinite([m["surrogate"] for m in hist]).all()
    assert best_ema > max(3.0, 2.0 * r0), (
        f"BPTT failed to learn: initial {r0:.3f}, best ema {best_ema:.3f}")

    # act() serves the best-EMA snapshot and is bounded by the tanh head
    a = np.asarray(trainer.act(trainer.obs))
    assert a.shape == (128, task.task_config.action_space_dim)
    assert np.abs(a).max() <= cfg.action_scale + 1e-6
