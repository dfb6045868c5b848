"""Obstacle scene compilation + functional obstacle state management.

Replaces the reference's AssetLoader/AssetManager/ObstacleManager/WarpEnv
quartet (env_manager/asset_loader.py, asset_manager.py, obstacle_manager.py,
warp_env_manager.py): URDF assets are compiled ONCE into padded primitive
tables (SceneParams); per-(env, slot) poses are plain SimState arrays, so
the reference's BVH refit after obstacle reset becomes a no-op — the
ray-cast/collision kernels read poses directly.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..assets import urdf as urdflib
from ..sim.structs import SceneParams, SimParams, SimState
from ..utils import rng as rnglib
from ..utils.math import interpolate_ratio, quat_from_euler_xyz_tensor

_KIND = {"box": 0, "cylinder": 1, "sphere": 2, "triangle": 3}

# Teleport target for culled obstacles (reference asset_manager.py:72)
CULL_POSITION = -1000.0


def build_scene_params(env_cfg, num_envs: int, max_prims: int = 16,
                       seed: int = 1234) -> SceneParams:
    """Compile the env's asset catalog into device arrays."""
    asset_types = getattr(env_cfg, "asset_types", [])
    variants_urdf: List[str] = []        # URDF text (or None for file models)
    variant_models: dict = {}            # variant idx -> preloaded UrdfModel
    variant_type_index: List[int] = []   # variant -> asset type idx
    type_variant_ranges = []
    for t_idx, at in enumerate(asset_types):
        start = len(variants_urdf)
        # on-disk asset folders: every *.urdf is a variant, batch-compiled
        # through the native threaded loader (reference asset_loader.py:46-57
        # random file selection semantics)
        folder = getattr(at, "asset_folder", "")
        if folder:
            import glob as _glob
            files = sorted(_glob.glob(os.path.join(folder, "*.urdf")))
            from ..assets import native_loader
            models = native_loader.load_urdf_batch(files) if files else None
            if models is None:
                models = [urdflib.load_urdf(f) for f in files]
            for m in models:
                variant_models[len(variants_urdf)] = m
                variants_urdf.append(None)
                variant_type_index.append(t_idx)
        for v in at.urdf_variants:
            variants_urdf.append(v)
            variant_type_index.append(t_idx)
        type_variant_ranges.append((start, len(variants_urdf)))

    V = max(len(variants_urdf), 1)
    P = max_prims
    prim_kind = -np.ones((V, P), np.int32)
    prim_size = np.zeros((V, P, 3), np.float32)
    prim_pos = np.zeros((V, P, 3), np.float32)
    prim_rot = np.tile(np.eye(3, dtype=np.float32), (V, P, 1, 1))
    prim_semantic = np.zeros((V, P), np.int32)
    variant_radius = np.zeros((V,), np.float32)

    sem_counter = 100  # incremental ids for semantic_id == -1 assets
    for v_idx, text in enumerate(variants_urdf):
        at = asset_types[variant_type_index[v_idx]]
        model = (variant_models[v_idx] if text is None else
                 urdflib.load_urdf_string(text, name=f"variant_{v_idx}"))
        prims = model.primitives[:P]
        for p_idx, pr in enumerate(prims):
            prim_kind[v_idx, p_idx] = _KIND[pr.kind]
            prim_size[v_idx, p_idx] = pr.size
            prim_pos[v_idx, p_idx] = pr.xyz
            prim_rot[v_idx, p_idx] = pr.rot
            prim_semantic[v_idx, p_idx] = (
                at.semantic_id if at.semantic_id >= 0 else sem_counter
            )
        variant_radius[v_idx] = model.bound_radius
        sem_counter += 1

    # slots: one per asset instance per env. keep_in_env assets come FIRST
    # so the curriculum's "first num_obstacles slots stay" culling never
    # removes walls/panels (reference asset_loader.py:148-185 ordering +
    # asset_manager.py:72 teleport).
    slot_entries = []
    for t_idx, at in enumerate(asset_types):
        for _ in range(at.num_assets):
            slot_entries.append((0 if at.keep_in_env else 1, t_idx, at))
    slot_entries.sort(key=lambda s: s[0])
    slots_min = [at.min_state_ratio for _, _, at in slot_entries]
    slots_max = [at.max_state_ratio for _, _, at in slot_entries]
    slots_keep = [1.0 if keep == 0 else 0.0 for keep, _, _ in slot_entries]
    slots_sem = [at.semantic_id for _, _, at in slot_entries]
    slot_type = [t_idx for _, t_idx, _ in slot_entries]
    A = len(slots_min)

    # random variant pick per (env, slot) — mirrors the reference's random
    # per-env asset file selection (asset_loader.py:46-57)
    rng = np.random.RandomState(seed)
    env_asset_variant = np.zeros((num_envs, A), np.int32)
    for a_idx in range(A):
        lo, hi = type_variant_ranges[slot_type[a_idx]]
        env_asset_variant[:, a_idx] = rng.randint(lo, hi, size=num_envs)

    # ---- flattened per-env primitive soup --------------------------------
    # Prims are SORTED BY KIND (box, cylinder, sphere, triangle) and padded per kind
    # to the max count across envs: the Pallas ray-cast kernel then runs
    # three branch-free loops with static bounds instead of per-prim
    # dispatch. Padding prims are parked at CULL_POSITION with zero size.
    per_env_by_kind = {k: [[] for _ in range(num_envs)] for k in range(4)}
    for e in range(num_envs):
        for a in range(A):
            v = env_asset_variant[e, a]
            for p in range(P):
                k = int(prim_kind[v, p])
                if k < 0:
                    continue
                per_env_by_kind[k][e].append(
                    (a, prim_size[v, p], prim_pos[v, p], prim_rot[v, p],
                     prim_semantic[v, p]))
    kind_max = {k: max((len(per_env_by_kind[k][e]) for e in range(num_envs)),
                       default=0) for k in range(4)}
    P_env = max(sum(kind_max.values()), 1)
    ep_slot = np.zeros((num_envs, P_env), np.int32)
    ep_kind = -np.ones((num_envs, P_env), np.int32)
    ep_size = np.zeros((num_envs, P_env, 3), np.float32)
    ep_pos = np.full((num_envs, P_env, 3), CULL_POSITION, np.float32)
    ep_rot = np.tile(np.eye(3, dtype=np.float32), (num_envs, P_env, 1, 1))
    ep_sem = np.zeros((num_envs, P_env), np.int32)
    for e in range(num_envs):
        c = 0
        for k in range(4):
            entries = per_env_by_kind[k][e]
            for (a, sz, pp, pr, sm) in entries:
                ep_slot[e, c] = a
                ep_kind[e, c] = k
                ep_size[e, c] = sz
                ep_pos[e, c] = pp
                ep_rot[e, c] = pr
                ep_sem[e, c] = sm
                c += 1
            # padding entries for this kind (kind set so the pallas kernel's
            # per-kind loop bounds stay valid; zero size at CULL_POSITION
            # never hits)
            for _ in range(kind_max[k] - len(entries)):
                ep_kind[e, c] = k
                c += 1

    # per-env culling priority: keep slots first (rank < n_keep), the rest
    # a per-env random permutation (reference asset_loader.py:181-185)
    keep_idx = [i for i, k in enumerate(slots_keep) if k > 0]
    free_idx = [i for i, k in enumerate(slots_keep) if k == 0]
    cull_rank = np.zeros((num_envs, A), np.int32)
    for e in range(num_envs):
        order = keep_idx + list(rng.permutation(free_idx))
        for rank, slot in enumerate(order):
            cull_rank[e, slot] = rank

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return SceneParams(
        prim_kind=jnp.asarray(prim_kind),
        prim_size=f32(prim_size),
        prim_pos=f32(prim_pos),
        prim_rot=f32(prim_rot),
        prim_semantic=jnp.asarray(prim_semantic),
        variant_radius=f32(variant_radius),
        env_asset_variant=jnp.asarray(env_asset_variant),
        min_state_ratio=f32(np.asarray(slots_min, np.float32)),
        max_state_ratio=f32(np.asarray(slots_max, np.float32)),
        keep_in_env=f32(slots_keep),
        semantic_id=jnp.asarray(np.asarray(slots_sem, np.int32)),
        env_prim_slot=jnp.asarray(ep_slot),
        env_prim_kind=jnp.asarray(ep_kind),
        env_prim_size=f32(ep_size),
        env_prim_pos=f32(ep_pos),
        env_prim_rot=f32(ep_rot),
        env_prim_semantic=jnp.asarray(ep_sem),
        cull_rank=jnp.asarray(cull_rank),
        num_assets=A,
        max_prims=P,
        num_env_prims=P_env,
        n_box=kind_max[0],
        n_cyl=kind_max[1],
        n_sph=kind_max[2],
        n_tri=kind_max[3],
    )


def reset_obstacles(params: SimParams, state: SimState, mask: jax.Array,
                    key: jax.Array) -> SimState:
    """Resample obstacle poses for envs in mask.

    Pose ratios ~ U[min_state_ratio, max_state_ratio] interpolated into the
    env bounds (reference asset_manager.py:52-72). With prob 0.15 an env gets
    half obstacle density this episode; culled non-keep_in_env obstacles are
    teleported to -1000 (reference env_manager.py:284-295).
    """
    sc = params.scene
    N, A = state.obstacle_pos.shape[0], sc.num_assets

    k_pose = jax.vmap(jax.random.fold_in)(key, jnp.zeros((N,), jnp.uint32))
    k_half = jax.vmap(jax.random.fold_in)(key, jnp.ones((N,), jnp.uint32))

    ratios = rnglib.env_uniform(k_pose, sc.min_state_ratio, sc.max_state_ratio,
                                (A, 13))
    pos = interpolate_ratio(state.bounds_lo[:, None, :], state.bounds_hi[:, None, :],
                            ratios[..., 0:3])
    quat = quat_from_euler_xyz_tensor(ratios[..., 3:6])

    # curriculum obstacle count: the first num_obstacles slots stay (keep_in_env
    # slots are ordered first and never culled); with Bernoulli(0.15) an env
    # gets half density this episode (reference env_manager.py:284-295)
    n_keep = jnp.sum(sc.keep_in_env)
    num = jnp.maximum(state.num_obstacles.astype(jnp.float32), n_keep)   # (N,)
    half = rnglib.env_bernoulli(k_half, 0.15)                            # (N,)
    num = jnp.where(half > 0, jnp.maximum(jnp.floor(num / 2.0), n_keep), num)
    # per-env priority order decides WHICH slots the curriculum culls
    # (reference: per-env shuffled non-keep assets)
    culled = ((sc.cull_rank.astype(jnp.float32) >= num[:, None])
              .astype(jnp.float32) * (1.0 - sc.keep_in_env[None, :]))
    pos = jnp.where(culled[..., None] > 0,
                    jnp.full_like(pos, CULL_POSITION), pos)

    m = mask.astype(bool)[:, None, None]
    new_pos = jnp.where(m, pos, state.obstacle_pos)
    new_quat = jnp.where(m, quat, state.obstacle_quat)
    zeros = jnp.zeros_like(state.obstacle_linvel)
    new_linvel = jnp.where(m, zeros, state.obstacle_linvel)
    new_angvel = jnp.where(m, zeros, state.obstacle_angvel)
    return state.replace(obstacle_pos=new_pos, obstacle_quat=new_quat,
                         obstacle_linvel=new_linvel, obstacle_angvel=new_angvel)


def apply_env_actions(params: SimParams, state: SimState,
                      env_actions: jax.Array) -> SimState:
    """Dynamic obstacles: env_actions (N, A, 6) -> obstacle twists
    (reference obstacle_manager.py:40-48)."""
    if env_actions.ndim == 2:
        env_actions = jnp.broadcast_to(
            env_actions[:, None, :],
            state.obstacle_linvel.shape[:2] + (env_actions.shape[-1],))
    linvel = env_actions[..., 0:3]
    angvel = env_actions[..., 3:6] if env_actions.shape[-1] >= 6 else jnp.zeros_like(linvel)
    return state.replace(obstacle_linvel=linvel, obstacle_angvel=angvel)


def integrate_obstacles(params: SimParams, state: SimState) -> SimState:
    """Kinematic obstacle motion (velocities set by env_actions)."""
    from ..utils.math import quat_integrate
    dt = params.dt
    pos = state.obstacle_pos + dt * state.obstacle_linvel
    quat = quat_integrate(state.obstacle_quat, state.obstacle_angvel, dt)
    return state.replace(obstacle_pos=pos, obstacle_quat=quat)
