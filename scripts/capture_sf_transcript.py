#!/usr/bin/env python
"""Capture a REAL sample-factory <-> env transcript.

Run this on a machine where sample-factory IS installed (it has no wheel in
this image):

    python scripts/capture_sf_transcript.py \
        --out tests/data/sf_protocol_transcript.json

It registers the aerial-gym envs with the real library, drives env creation
through sample-factory's own make_env pipeline, records every reset/step
call crossing the boundary (argv, resolved cfg, shapes, dtypes, tuple
arity, torch-vs-numpy action kinds), and writes the transcript JSON that
tests/test_sample_factory_adapter.py replays. Until then the committed
transcript is a reconstructed pin of the 2.1.x protocol (see its
`provenance` block) derived from the reference entry
(/root/reference/.../train_aerialgym.py:33-350).
"""

from __future__ import annotations

import argparse
import json
import sys


class RecordingEnv:
    """Transparent proxy that logs the protocol traffic of a vec env."""

    def __init__(self, env, log):
        self._env = env
        self._log = log

    def __getattr__(self, name):
        return getattr(self._env, name)

    @staticmethod
    def _describe(x):
        import numpy as np
        if hasattr(x, "shape"):
            kind = "torch" if hasattr(x, "detach") else "numpy"
            return {"kind": kind, "shape": list(np.asarray(x).shape),
                    "dtype": str(np.asarray(x).dtype)}
        return {"type": type(x).__name__}

    def reset(self, *args, **kwargs):
        out = self._env.reset(*args, **kwargs)
        obs, info = out
        self._log.append({
            "call": "reset", "kwargs": {k: v for k, v in kwargs.items()
                                        if isinstance(v, (int, float, str))},
            "returns": {"tuple_len": len(out),
                        "obs": {"keys": sorted(obs.keys()),
                                "obs_shape": list(obs["obs"].shape),
                                "obs_dtype": str(obs["obs"].dtype)},
                        "info_type": type(info).__name__}})
        return out

    def step(self, actions):
        out = self._env.step(actions)
        obs, rew, term, trunc, infos = out
        self._log.append({
            "call": "step", "actions": self._describe(actions),
            "returns": {"tuple_len": len(out),
                        "obs": {"keys": sorted(obs.keys()),
                                "obs_shape": list(obs["obs"].shape),
                                "obs_dtype": str(obs["obs"].dtype)},
                        "rew": self._describe(rew),
                        "terminated": self._describe(term),
                        "truncated": self._describe(trunc)}})
        return out

    def close(self):
        self._log.append({"call": "close"})
        return self._env.close()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="tests/data/sf_protocol_transcript.json")
    ap.add_argument("--env", default="position_setpoint_task")
    ap.add_argument("--env_agents", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    try:
        import sample_factory  # noqa: F401
    except ImportError:
        print("sample-factory is not installed — this capture tool needs "
              "the real library. The committed transcript pin stays in "
              "place until you run this somewhere it is available.",
              file=sys.stderr)
        sys.exit(2)

    from sample_factory.cfg.arguments import parse_full_cfg, parse_sf_args

    from aerial_gym_simulator_tpu.rl_training.sample_factory import (
        aerialgym_env as sfmod)

    sfmod.register_aerialgym_custom_components()
    argv = [f"--env={args.env}", f"--env_agents={args.env_agents}",
            "--experiment=transcript_capture"]
    parser, partial = parse_sf_args(argv=argv, evaluation=False)
    sfmod.add_extra_params_func(parser)
    sfmod.override_default_params_func(args.env, parser)
    cfg = parse_full_cfg(parser, argv=argv)

    log = []
    env = RecordingEnv(sfmod.make_aerialgym_env(args.env, cfg=cfg), log)

    import numpy as np
    import torch

    obs, _ = env.reset(seed=0)
    act_shape = (args.env_agents, env.action_space.shape[0])
    env.step(np.zeros(act_shape, np.float32))
    env.step(torch.zeros(act_shape, dtype=torch.float32))
    for _ in range(args.steps - 2):
        env.step(np.zeros(act_shape, np.float32))
    env.close()

    cfg_keys = sorted(set(list(sfmod.SF_BASE_DEFAULTS)
                          + list(sfmod.SF_ENV_CONFIGS.get(args.env, {}))
                          + ["env_agents", "obs_key"]))
    transcript = {
        "provenance": {
            "what": "REAL sample-factory traffic captured by "
                    "scripts/capture_sf_transcript.py",
            "sample_factory_version_pin": sample_factory.__version__,
        },
        "argv": argv,
        "resolved_cfg": {k: getattr(cfg, k) for k in cfg_keys
                         if hasattr(cfg, k)},
        "env_contract": {
            "num_agents": env.num_agents,
            "observation_space": {
                "type": "Dict", "keys": sorted(env.observation_space.spaces),
                "obs": {"type": "Box",
                        "shape": list(env.observation_space["obs"].shape),
                        "dtype": str(env.observation_space["obs"].dtype)}},
            "action_space": {"type": "Box",
                             "shape": list(env.action_space.shape),
                             "dtype": str(env.action_space.dtype),
                             "low": float(env.action_space.low.min()),
                             "high": float(env.action_space.high.max())},
            "render_mode_attr": hasattr(env, "render_mode"),
            "auto_reset": "in-env",
        },
        "calls": log,
    }
    with open(args.out, "w") as f:
        json.dump(transcript, f, indent=2)
    print(f"wrote {args.out} ({len(log)} calls)")


if __name__ == "__main__":
    main()
