"""Differential data parity of the obstacle-asset catalog vs the REFERENCE.

Compares per-type counts, keep_in_env, semantic-id semantics, per-link
segmentation and the 13-element pose-ratio sampling ranges against the
reference's asset_config modules (env_object_config, lidar_nav_env_config,
dynamic_env_object_config), plus the env-level compositions.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFC = "/root/reference/aerial_gym/config"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFC),
                                reason="reference checkout not present")

from aerial_gym_simulator_tpu.config.asset_config import (  # noqa: E402
    env_object_config as eoc,
)


@pytest.fixture(scope="module")
def ref_asset_modules():
    ag = sys.modules.setdefault("aerial_gym", types.ModuleType("aerial_gym"))
    if not hasattr(ag, "AERIAL_GYM_DIRECTORY"):
        ag.AERIAL_GYM_DIRECTORY = "/root/reference"
        ag.__path__ = [os.path.dirname(REFC)]
    for pkg, p in [("aerial_gym.config", REFC),
                   ("aerial_gym.config.asset_config", REFC + "/asset_config")]:
        if pkg not in sys.modules:
            m = types.ModuleType(pkg)
            m.__path__ = [p]
            sys.modules[pkg] = m
    return {
        name: importlib.import_module("aerial_gym.config.asset_config." + name)
        for name in ("env_object_config", "lidar_nav_env_config",
                     "dynamic_env_object_config")
    }


def _check(ref_cls, ours, label, expect_semantic=None):
    assert ours.num_assets == ref_cls.num_assets, label
    assert bool(ours.keep_in_env) == bool(ref_cls.keep_in_env), label
    sem = expect_semantic if expect_semantic is not None else ref_cls.semantic_id
    assert ours.semantic_id == sem, label
    assert bool(ours.per_link_semantic) == bool(ref_cls.per_link_semantic), label
    np.testing.assert_allclose(
        np.asarray(ours.min_state_ratio, float)[:6],
        np.asarray(ref_cls.min_state_ratio, float)[:6], atol=1e-6,
        err_msg=label + ".min_state_ratio")
    np.testing.assert_allclose(
        np.asarray(ours.max_state_ratio, float)[:6],
        np.asarray(ref_cls.max_state_ratio, float)[:6], atol=1e-6,
        err_msg=label + ".max_state_ratio")


def test_env_object_asset_params(ref_asset_modules):
    m = ref_asset_modules["env_object_config"]
    _check(m.panel_asset_params, eoc.panel_asset_params(3), "panels")
    _check(m.tile_asset_params, eoc.tile_asset_params(1), "tiles")
    _check(m.thin_asset_params, eoc.thin_asset_params(0), "thin")
    _check(m.tree_asset_params, eoc.tree_asset_params(1), "trees")
    _check(m.object_asset_params, eoc.object_asset_params(35), "objects")
    for wall in ("left_wall", "right_wall", "top_wall", "bottom_wall",
                 "front_wall", "back_wall"):
        _check(getattr(m, wall), getattr(eoc, wall)(), wall)


def test_env_object_semantic_constants(ref_asset_modules):
    m = ref_asset_modules["env_object_config"]
    for c in ("THIN_SEMANTIC_ID", "TREE_SEMANTIC_ID", "OBJECT_SEMANTIC_ID",
              "PANEL_SEMANTIC_ID", "FRONT_WALL_SEMANTIC_ID",
              "BACK_WALL_SEMANTIC_ID", "LEFT_WALL_SEMANTIC_ID",
              "RIGHT_WALL_SEMANTIC_ID", "BOTTOM_WALL_SEMANTIC_ID",
              "TOP_WALL_SEMANTIC_ID"):
        assert getattr(eoc, c) == getattr(m, c), c


def test_lidar_nav_asset_params(ref_asset_modules):
    m = ref_asset_modules["lidar_nav_env_config"]
    _check(m.panel_asset_params, eoc.lidar_nav_panel_asset_params(15),
           "lidar_nav.panels")
    _check(m.object_asset_params, eoc.lidar_nav_object_asset_params(70),
           "lidar_nav.objects")
    for wall in ("left_wall", "right_wall", "top_wall", "bottom_wall",
                 "front_wall", "back_wall"):
        _check(getattr(m, wall),
               eoc.lidar_nav_wall(getattr(eoc, wall)), "lidar_nav." + wall)


def test_dynamic_object_asset_params(ref_asset_modules):
    m = ref_asset_modules["dynamic_env_object_config"]
    _check(m.object_asset_params, eoc.dynamic_object_asset_params(40),
           "dynamic.objects")


def test_env_compositions_match_reference():
    """Asset include-maps per env config (reference env_with_obstacles.py
    :50-83, env_with_lidar_nav_obstacles.py, forest_env.py :40-50,
    dynamic_environment.py :36-49)."""
    from aerial_gym_simulator_tpu.registry.registries import env_config_registry
    import aerial_gym_simulator_tpu.config  # noqa: F401

    def names_counts(env_name):
        cfg = env_config_registry.make(env_name)
        return {t.name: t.num_assets for t in cfg.asset_types}

    assert names_counts("env_with_obstacles") == {
        "panels": 3, "objects": 35, "left_wall": 1, "right_wall": 1,
        "back_wall": 1, "front_wall": 1, "top_wall": 1, "bottom_wall": 1}
    assert names_counts("env_with_lidar_nav_obstacles") == {
        "panels": 15, "objects": 70, "left_wall": 1, "right_wall": 1,
        "back_wall": 1, "front_wall": 1, "top_wall": 1, "bottom_wall": 1}
    assert names_counts("forest_env") == {
        "trees": 1, "objects": 35, "bottom_wall": 1}
    assert names_counts("dynamic_env") == {"objects": 40}
    # lidar-nav walls are cullable (keep_in_env False)
    lidar = env_config_registry.make("env_with_lidar_nav_obstacles")
    assert all(not t.keep_in_env for t in lidar.asset_types)


def test_curriculum_culls_random_per_env_subset():
    """The reference shuffles non-keep assets per env at build time
    (asset_loader.py:181-185), so at a given curriculum level DIFFERENT
    slots are culled in different envs; keep_in_env slots never cull."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
    from aerial_gym_simulator_tpu.envs.scene import CULL_POSITION

    env = SimBuilder().build_env("base_sim", "env_with_lidar_nav_obstacles",
                                 "base_quadrotor", "lee_velocity_control",
                                 num_envs=16, seed=11)
    env.reset()
    st = env.state.replace(num_obstacles=jnp.full((16,), 40, jnp.int32))
    from aerial_gym_simulator_tpu.envs.scene import reset_obstacles
    keys = env.state.rng
    st = reset_obstacles(env.params, st, jnp.ones((16,)), keys)
    pos = np.asarray(st.obstacle_pos)
    culled = pos[..., 0] < CULL_POSITION / 2  # (16, A) bool
    # roughly A-40-ish culled per env (exact count varies with the
    # Bernoulli half-density draw), but never everything and never nothing
    assert culled.any() and not culled.all()
    # the culled SET differs between envs (per-env shuffle)
    patterns = {tuple(row) for row in culled}
    assert len(patterns) > 4, len(patterns)
    # keep_in_env slots are never culled (none in the lidar env; check on
    # the nav env where walls/panels are keep_in_env)
    env2 = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                  "base_quadrotor", "lee_velocity_control",
                                  num_envs=8, seed=3)
    env2.reset()
    st2 = env2.state.replace(num_obstacles=jnp.full((8,), 15, jnp.int32))
    st2 = reset_obstacles(env2.params, st2, jnp.ones((8,)), env2.state.rng)
    keep = np.asarray(env2.params.scene.keep_in_env) > 0
    pos2 = np.asarray(st2.obstacle_pos)
    assert (pos2[:, keep, 0] > CULL_POSITION / 2).all()
