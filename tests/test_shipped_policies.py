"""Shipped trained-policy artifacts as policy-regression anchors.

The reference ships trained checkpoints (examples/dce_rl_navigation/
selected_network/, sim2real/weights/) and replays them as its de-facto
regression test. These tests replay the repo's OWN shipped artifacts —
trained on chip by scripts/train_shipped_position_policy.py and
scripts/revalidate_nav_e2e.sh — with NO dependency on the reference
checkout. Skipped only until the artifacts are first committed.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.sim2real.numpy_policy import load_policy_npz

# Deployment-path numerics must be warning-clean (VERDICT r4 #5): the
# replay of every shipped artifact runs with RuntimeWarning promoted to
# error, so an overflow/invalid sneaking into the numpy inference classes
# fails the suite instead of scrolling by.
pytestmark = pytest.mark.filterwarnings("error::RuntimeWarning")

_PKG = os.path.dirname(os.path.abspath(ag.__file__))
_WEIGHTS = os.path.join(_PKG, "sim2real", "weights")
_DCE = os.path.join(_PKG, "..", "examples", "dce_rl_navigation",
                    "selected_network")

_POS_NPZ = os.path.join(_WEIGHTS, "position_policy.npz")
_NAV_NPZ = os.path.join(_DCE, "navigation_policy.npz")
_NAV_VAE = os.path.join(_DCE, "depth_vae.pkl")
_RADAR_NPZ = os.path.join(_DCE, "radar_navigation_policy.npz")
_VIT_NPZ = os.path.join(_DCE, "vit_navigation_policy.npz")
_VIT_ENC = os.path.join(_DCE, "vit_depth_encoder.pkl")


@pytest.mark.skipif(not os.path.exists(_POS_NPZ),
                    reason="position artifacts not trained yet "
                           "(scripts/train_shipped_position_policy.py)")
def test_shipped_position_policy_hovers():
    """The committed position policy flies closed loop to the origin:
    no crashes, steady distance under 0.5 m."""
    N = 16
    task = ag.task_registry.make_task("position_setpoint_task", num_envs=N,
                                      seed=321)
    policy = load_policy_npz(_POS_NPZ, num_envs=N)
    obs, *_ = task.reset()
    crashes = 0
    dists = []
    for i in range(250):
        act = policy(np.asarray(obs["observations"]))
        obs, r, term, trunc, info = task.step(jnp.asarray(act))
        crashes += int(np.asarray(term).sum())
        if i >= 150:
            dists.append(np.linalg.norm(np.asarray(task.state.pos), axis=-1))
    assert crashes == 0, f"{crashes} crashes replaying the shipped policy"
    mean_dist = float(np.mean(dists))
    assert mean_dist < 0.5, f"hover distance {mean_dist:.3f} m"


@pytest.mark.skipif(not os.path.exists(_POS_NPZ),
                    reason="position artifacts not trained yet")
def test_shipped_position_eval_json_claims_hold():
    """The committed eval JSON's claims stay in sync with the artifact."""
    with open(os.path.join(_WEIGHTS, "position_policy_eval.json")) as f:
        ev = json.load(f)
    assert ev["crashes"] == 0
    assert ev["mean_distance_to_target_m"] < 0.5
    curve = json.load(open(os.path.join(_WEIGHTS,
                                        "position_learning_curve.json")))
    assert curve["env_steps_to_threshold"] is not None, \
        "training never crossed the reward threshold"
    # BASELINE.md: sub-minute position-control learning curve
    assert curve["wall_s_to_threshold"] < 60.0


@pytest.mark.skipif(not (os.path.exists(_NAV_NPZ)
                         and os.path.exists(_NAV_VAE)),
                    reason="navigation artifacts not trained yet "
                           "(scripts/revalidate_nav_e2e.sh)")
def test_shipped_navigation_policy_flies():
    """The committed navigation policy + frozen VAE fly the obstacle course
    closed loop: successes occur, crash rate stays moderate (CPU-sized)."""
    import dataclasses

    N = 8
    cfg = ag.task_registry.get_task_config("navigation_task")
    cfg = dataclasses.replace(cfg, vae_params_path=_NAV_VAE)
    task = ag.task_registry.make_task("navigation_task", num_envs=N,
                                      seed=99, task_config=cfg)
    policy = load_policy_npz(_NAV_NPZ, num_envs=N)
    obs, *_ = task.reset()
    succ = crash = timo = 0
    for _ in range(300):
        act = policy(np.asarray(obs["observations"]))
        assert np.isfinite(act).all()
        obs, r, term, trunc, info = task.step(jnp.asarray(act))
        succ += int(np.asarray(info["successes"]).sum())
        crash += int(np.asarray(info["crashes"]).sum())
        timo += int(np.asarray(info["timeouts"]).sum())
    total = max(succ + crash + timo, 1)
    assert succ > 0, f"no successes in 300 steps (s{succ}/c{crash}/t{timo})"
    assert succ / total > 0.3, f"success share {succ}/{total}"


@pytest.mark.skipif(not os.path.exists(_RADAR_NPZ),
                    reason="radar artifacts not trained yet "
                           "(scripts/train_radar_r4.sh)")
def test_shipped_radar_policy_flies():
    """The committed recurrent radar policy (GRU archive) flies the
    fake-radar task closed loop at the PARITY observation distribution
    (80% invalid returns): finite actions, per-env hidden-state resets at
    episode boundaries, and at least one goal reach (the task's eval
    success is the hardest of the shipped set — see radar_eval.json for
    the chip-eval number this artifact reproduced)."""
    N = 8
    task = ag.task_registry.make_task("radar_navigation_task", num_envs=N,
                                      seed=99)
    policy = load_policy_npz(_RADAR_NPZ, num_envs=N)
    assert getattr(policy, "recurrent", False), \
        "radar archive must carry the GRU core"
    obs, *_ = task.reset()
    succ = crash = timo = 0
    for _ in range(450):
        act = policy(np.asarray(obs["observations"]))
        assert np.isfinite(act).all()
        obs, r, term, trunc, info = task.step(jnp.asarray(act))
        done = (np.asarray(term) > 0) | (np.asarray(trunc) > 0)
        if done.any():
            policy.reset(np.nonzero(done)[0])
        succ += int(np.asarray(info["successes"]).sum())
        crash += int(np.asarray(info["crashes"]).sum())
        timo += int(np.asarray(info["timeouts"]).sum())
    assert succ > 0, f"no successes (s{succ}/c{crash}/t{timo})"


@pytest.mark.skipif(not (os.path.exists(_VIT_NPZ)
                         and os.path.exists(_VIT_ENC)),
                    reason="ViT navigation artifacts not trained yet "
                           "(scripts/train_vit_nav_e2e.sh)")
def test_shipped_vit_navigation_policy_flies():
    """The committed ViT-encoder navigation policy (transformer perception
    backbone, models/vit.py) flies the obstacle course closed loop — the
    arch-tagged pickle must route the task to ViTImageEncoder."""
    import dataclasses

    N = 8
    cfg = ag.task_registry.get_task_config("navigation_task")
    cfg = dataclasses.replace(cfg, vae_params_path=_VIT_ENC)
    task = ag.task_registry.make_task("navigation_task", num_envs=N,
                                      seed=99, task_config=cfg)
    from aerial_gym_simulator_tpu.models.vit import ViTImageEncoder
    assert isinstance(task.vae, ViTImageEncoder)
    policy = load_policy_npz(_VIT_NPZ, num_envs=N)
    obs, *_ = task.reset()
    succ = crash = timo = 0
    for _ in range(300):
        act = policy(np.asarray(obs["observations"]))
        assert np.isfinite(act).all()
        obs, r, term, trunc, info = task.step(jnp.asarray(act))
        succ += int(np.asarray(info["successes"]).sum())
        crash += int(np.asarray(info["crashes"]).sum())
        timo += int(np.asarray(info["timeouts"]).sum())
    total = max(succ + crash + timo, 1)
    assert succ > 0, f"no successes in 300 steps (s{succ}/c{crash}/t{timo})"
    assert succ / total > 0.3, f"success share {succ}/{total}"
