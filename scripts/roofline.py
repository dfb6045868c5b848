"""Roofline / MFU accounting for the two hot programs (PERF.md section).

Quantifies "fast" against hardware limits instead of only against the
5M steps/s baseline target (VERDICT r1 item 9):

  * fused position-PPO train step: FLOPs + bytes from XLA's own
    cost_analysis of the compiled program, utilization vs MXU peak and HBM
    bandwidth from the measured iteration time;
  * Pallas ray-cast kernel: XLA cannot see inside a custom call, so FLOPs
    are counted analytically from the kernel math (ops per primitive type
    per ray x live primitives after broad-phase) and compared with VPU
    peak (the kernel is all f32 vector ALU — the MXU is idle by design).

Run ALONE on the chip:  python scripts/roofline.py [--cpu]
Writes one JSON line per program to stdout (append to PERF.md).

Peak numbers used (TPU v5e public specs): 394 TFLOP/s bf16 MXU,
197 TFLOP/s int8..., f32 VPU ~= 3.6 TFLOP/s (1.74 GHz x 8x128 lanes x 2
FMA), HBM 819 GB/s.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_FLOPS = 394e12
V5E_VPU_F32_FLOPS = 3.6e12
V5E_HBM_BPS = 819e9


def analyze_ppo(num_envs=8192, iters=20):
    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

    task = ag.task_registry.make_task("position_setpoint_task",
                                      num_envs=num_envs, seed=0)
    cfg = PPOConfig(num_envs=num_envs, horizon=32, minibatch_size=8192,
                    epochs=4, seed=0)
    tr = PPOTrainer(task, cfg)
    args = (tr.train_state, tr.env_carry, tr.obs, tr.key, tr.norm)
    compiled = jax.jit(tr.train_step_fn, donate_argnums=(1,)).lower(
        *args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    out = compiled(*args)
    jax.block_until_ready(out[-1])
    args = out[:5]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*out[:5])
    jax.block_until_ready(out[-1])
    dt = (time.perf_counter() - t0) / iters

    steps = num_envs * 32
    rec = {
        "program": "position_ppo_train_step",
        "num_envs": num_envs,
        "xla_flops": flops,
        "xla_bytes_accessed": byts,
        "wall_s_per_iter": round(dt, 5),
        "env_steps_per_s": round(steps / dt),
        "achieved_tflops": round(flops / dt / 1e12, 3),
        "mxu_bf16_utilization_pct": round(100 * flops / dt / V5E_BF16_FLOPS, 2),
        "achieved_GBps": round(byts / dt / 1e9, 1),
        "hbm_utilization_pct": round(100 * byts / dt / V5E_HBM_BPS, 1),
    }
    print(json.dumps(rec))
    return rec


def analyze_nav_train(vae_params_path, num_envs=1024, iters=10):
    """Navigation train step (renderer + perception encoder + PPO learner in
    ONE jitted program) through XLA's own cost model — the config where MXU
    utilization stops being vacuous (VERDICT r2 #4): with `--arch vit` the
    encoder is transformer matmuls at every rollout step. Pass the VAE
    pickle from models/train_vae (conv or vit; arch is read from the tag).

    NOTE: XLA cannot see inside the Pallas ray-cast custom call, so flops/
    bytes EXCLUDE the renderer — the MXU numbers are encoder+learner; the
    renderer's VPU side is analyze_render's job."""
    import dataclasses
    import pickle

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import PPOConfig, PPOTrainer

    with open(vae_params_path, "rb") as f:
        loaded = pickle.load(f)
    arch = loaded.get("arch", "conv") if isinstance(loaded, dict) else "conv"

    task_config = dataclasses.replace(
        ag.task_registry.get_task_config("navigation_task"),
        vae_params_path=vae_params_path)
    task = ag.task_registry.make_task("navigation_task", num_envs=num_envs,
                                      seed=0, task_config=task_config)
    cfg = PPOConfig(num_envs=num_envs, horizon=32,
                    minibatch_size=min(8192, num_envs * 32), epochs=4, seed=0)
    tr = PPOTrainer(task, cfg)
    args = (tr.train_state, tr.env_carry, tr.obs, tr.key, tr.norm)
    compiled = jax.jit(tr.train_step_fn, donate_argnums=(1,)).lower(
        *args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    def anchor(out):
        """Host fetch = true completion (the train step contains the
        Pallas render; block_until_ready under-anchors — PERF.md r3)."""
        leaf = jax.tree_util.tree_leaves(out)[0]
        jax.device_get(jnp.sum(leaf))

    out = compiled(*args)
    anchor(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*out[:5])
    anchor(out)
    dt = (time.perf_counter() - t0) / iters

    steps = num_envs * cfg.horizon
    extra = ""
    if arch == "vit" and isinstance(loaded, dict):
        extra = (f"_dim{loaded.get('dim', 128)}"
                 f"_depth{loaded.get('depth', 4)}")
        if loaded.get("attn_impl", "xla") != "xla":
            extra += f"_{loaded['attn_impl']}"
    rec = {
        "program": f"navigation_ppo_train_step_{arch}_encoder{extra}",
        "num_envs": num_envs,
        "xla_flops_excl_pallas_render": flops,
        "xla_bytes_accessed": byts,
        "wall_s_per_iter": round(dt, 5),
        "env_steps_per_s": round(steps / dt),
        "achieved_tflops": round(flops / dt / 1e12, 3),
        "mxu_bf16_utilization_pct": round(100 * flops / dt / V5E_BF16_FLOPS, 2),
        "achieved_GBps": round(byts / dt / 1e9, 1),
        "hbm_utilization_pct": round(100 * byts / dt / V5E_HBM_BPS, 1),
    }
    print(json.dumps(rec))
    return rec


# analytic per-ray per-primitive FLOP counts for the kernel narrow phase
# (ops/raycast_pallas.py bodies; counting vector float ops incl. selects):
#   common prim transform (dirs R^T d): 15 mul+add
#   box: 3 recip(4) + 6 mul + 6 add + 6 min/max*... ~= 45
#   cylinder: ~55   sphere: ~25 (world frame)   triangle: ~35
_FLOPS = {"common": 15, 0: 45, 1: 55, 2: 25, 3: 35}


def analyze_render(num_envs=1024, h=135, w=240, iters=20):
    import aerial_gym_simulator_tpu as ag

    task = ag.task_registry.make_task("navigation_task", num_envs=num_envs,
                                      seed=0)
    sim = task.sim_env if hasattr(task, "sim_env") else task
    params = task.params
    sc = params.scene
    from aerial_gym_simulator_tpu.ops import raycast_pallas as rp
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import camera_ray_dirs

    dirs, _ = camera_ray_dirs(h, w, 90.0)
    dirs = jnp.asarray(dirs.reshape(-1, 3))
    R = dirs.shape[0]
    state = task.get_carry().sim if hasattr(task, "get_carry") else task.state

    pose = rp.pack_pose(state.pos, state.quat)
    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    ones = jnp.ones((R,), jnp.float32)

    # dirs/ones passed as ARGS, not captured: an array literal surviving in
    # a jitted program costs ~1.5 ms PER DISPATCH over the tunneled runtime
    # regardless of size (measured round 3, PERF.md) — capturing the ray
    # table would tax every standalone render and skew utilization low
    fn = jax.jit(lambda pose, prims, dirs, ones: rp.raycast_pallas(
        pose, prims, dirs, ones, sc.n_box, sc.n_cyl, sc.n_sph, 10.0,
        want_seg=False, n_tri=sc.n_tri)[0])
    # COMPLETION anchor via host fetch: block_until_ready on a pallas
    # output is not a completion barrier over the tunneled runtime
    # (0.18 ms "ready" vs 9.2 ms true — PERF.md r3)
    depth = fn(pose, prims, dirs, ones)
    float(jnp.sum(depth))
    t0 = time.perf_counter()
    for _ in range(iters):
        depth = fn(pose, prims, dirs, ones)
    float(jnp.sum(depth))
    dt = (time.perf_counter() - t0) / iters

    # surviving narrow-phase work after the EXACT broad phase (range test +
    # per-tile view-cone test, replicating _broadphase_mask in
    # ops/raycast_pallas.py on the same tiling)
    from aerial_gym_simulator_tpu.ops.raycast_pallas import _LANES, _TILE_ROWS
    from aerial_gym_simulator_tpu.utils.math import quat_to_rotation_matrix

    tile_rows = min(_TILE_ROWS, max(8, -(-R // _LANES // 8) * 8))
    tile_rays = tile_rows * _LANES
    R_pad = ((R + tile_rays - 1) // tile_rays) * tile_rays
    dirs_np = np.asarray(dirs)
    dirs_pad = np.concatenate(
        [dirs_np, np.repeat(dirs_np[-1:], R_pad - R, 0)], 0)
    tiles = R_pad // tile_rays
    unit = dirs_pad.reshape(tiles, tile_rays, 3)
    unit = unit / np.linalg.norm(unit, axis=-1, keepdims=True)
    t_axis = unit.sum(1)
    t_axis /= np.linalg.norm(t_axis, axis=-1, keepdims=True)
    cos_half = np.clip(np.einsum("tj,trj->tr", t_axis, unit).min(1), -1, 1)
    sin_half = np.sqrt(np.maximum(1 - cos_half**2, 0))

    pn = np.asarray(prims)
    centers = pn[:, :, 3:6]
    sx, sy, sz = pn[:, :, 0], pn[:, :, 1], pn[:, :, 2]
    P = pn.shape[1]
    kinds = np.asarray([0] * sc.n_box + [1] * sc.n_cyl + [2] * sc.n_sph
                       + [3] * sc.n_tri)
    bound = np.where(kinds == 0, 0.5 * np.sqrt(sx**2 + sy**2 + sz**2),
                     np.where(kinds == 1, np.sqrt(sx**2 + 0.25 * sy**2),
                              np.where(kinds == 3,
                                       np.maximum(sx, np.sqrt(sy**2 + sz**2)),
                                       sx)))
    origin = np.asarray(state.pos)
    quat = np.asarray(state.quat)
    u = centers - origin[:, None, :]
    d2 = (u * u).sum(-1)
    in_range = d2 < (10.0 + bound) ** 2
    Rm = np.asarray(quat_to_rotation_matrix(jnp.asarray(quat)))
    axis_w = np.einsum("nij,tj->nti", Rm, t_axis)
    along = np.einsum("nti,npi->ntp", axis_w, u)
    perp = np.sqrt(np.maximum(d2[:, None, :] - along**2, 0))
    visible = (perp * cos_half[None, :, None]
               - along * sin_half[None, :, None]) <= bound[:, None, :]
    mask = in_range[:, None, :] & visible                    # (N, T, P)

    flops_per_prim = np.array([_FLOPS[int(k)]
                               + (_FLOPS["common"] if k != 2 else 0)
                               for k in kinds])
    total_flops = float((mask * flops_per_prim[None, None, :]).sum()
                        * tile_rays)
    flops_ray = total_flops / (R_pad * num_envs)
    live_range = float(in_range.sum(1).mean())
    survive = float(mask.mean()) / max(float(in_range.mean()), 1e-9)
    bytes_moved = num_envs * R * (12 + 4)   # dirs read + depth written

    rec = {
        "program": "pallas_raycast_depth",
        "num_envs": num_envs, "rays": R,
        "in_range_prims_per_env_mean": round(live_range, 1),
        "cone_survival_fraction": round(survive, 3),
        "analytic_flops_per_ray": round(flops_ray, 1),
        "wall_s_per_render": round(dt, 5),
        "m_rays_per_s": round(num_envs * R / dt / 1e6, 1),
        "achieved_vpu_tflops": round(total_flops / dt / 1e12, 3),
        "vpu_f32_utilization_pct": round(
            100 * total_flops / dt / V5E_VPU_F32_FLOPS, 1),
        "hbm_GBps": round(bytes_moved / dt / 1e9, 2),
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nav_vae", default=None,
                    help="VAE pickle path: also analyze the navigation "
                         "train step (conv or vit arch tag)")
    ap.add_argument("--nav_only", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from aerial_gym_simulator_tpu.rl.ppo import enable_compilation_cache
    enable_compilation_cache()
    if not args.nav_only:
        analyze_ppo()
        analyze_render()
    if args.nav_vae:
        analyze_nav_train(args.nav_vae)


if __name__ == "__main__":
    main()
