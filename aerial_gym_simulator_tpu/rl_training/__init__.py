"""RL training adapters (reference aerial_gym/rl_training/).

Three entry styles, mirroring the reference's rl-games / CleanRL /
sample-factory integrations:

  * ``rl_games/runner.py``  — YAML-configured train/play CLI
  * ``cleanrl/ppo_continuous_action.py`` — single-file PPO script
  * ``sample_factory/aerialgym_env.py`` — vec-env adapter (import-guarded;
    sample-factory is optional and not bundled)
"""
