"""Render-kernel ceiling study (VERDICT r2 #7).

Decomposes the Pallas ray-cast kernel's wall time into the fixed floor
(everything that runs with ZERO visible primitives: XLA-side broad-phase
prep, per-grid-cell overhead, dir rotation, scratch init, image DMA) and
the narrow-phase sweep, via the `debug_force_mask` isolation knob
("zeros" / "ones" / None = real mask). Utilization of the narrow phase
ALONE — analytic FLOPs / (t_real - t_floor) — is the number that says
whether more kernel micro-tuning can pay at all.

Also profiles the two shapes the round-3 numbers raised questions about:
the 16k-env bench scene (1.77 G rays/s vs 4.07 at the 1024-env nav
shape) and the want_normals/RGB path (43.9 ms/frame vs 8.2 depth-only).

Run ALONE on the chip:  python scripts/kernel_ceiling.py [--cpu]
One JSON line per measurement; append keepers to ROOFLINE.jsonl + PERF.md.
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

V5E_VPU_F32_FLOPS = 3.6e12
# analytic per-ray per-prim narrow-phase FLOPs (scripts/roofline.py _FLOPS)
_FLOPS = {"common": 15, 0: 45, 1: 55, 2: 25, 3: 35}


def _timeit(fn, *a, iters=20):
    """COMPLETION-anchored: jax.block_until_ready on a pallas output is NOT
    a completion barrier over the tunneled runtime (measured 0.18 ms
    "ready" vs 9.2 ms true device time, PERF.md r3) — only a host fetch
    anchors. One scalar fetch per timing block, amortized."""
    out = fn(*a)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def _camera_dirs(h, w):
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import camera_ray_dirs
    dirs, _ = camera_ray_dirs(h, w, 90.0)
    return jnp.asarray(dirs.reshape(-1, 3))


def isolate(tag, sc, state, h=135, w=240, iters=20, max_range=10.0,
            want_normals=False):
    """Time the kernel at (envs from state) x (h x w) with the real mask,
    all-visible, and all-culled; report narrow-phase-only utilization."""
    from aerial_gym_simulator_tpu.ops import raycast_pallas as rp

    dirs = _camera_dirs(h, w)
    R = dirs.shape[0]
    ones = jnp.ones((R,), jnp.float32)
    pose = rp.pack_pose(state.pos, state.quat)
    prims = rp.pack_prims_world(sc, state.obstacle_pos, state.obstacle_quat)
    N = pose.shape[0]

    def run(force):
        # dirs/ones as ARGS: a surviving array literal costs ~1.5 ms per
        # dispatch over the tunnel (fixed, size-independent — PERF.md r3)
        f = jax.jit(lambda pose, prims, dirs, ones: rp.raycast_pallas(
            pose, prims, dirs, ones, sc.n_box, sc.n_cyl, sc.n_sph,
            max_range, want_seg=want_normals, n_tri=sc.n_tri,
            want_normals=want_normals, debug_force_mask=force)[0])
        return _timeit(f, pose, prims, dirs, ones, iters=iters)

    t_real = run(None)
    t_vis = run("ones")
    t_cul = run("zeros")

    # analytic narrow-phase FLOPs under the REAL mask (replicates the
    # kernel's own broad phase on the same tiling — scripts/roofline.py)
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
    u = centers - origin[:, None, :]
    d2 = (u * u).sum(-1)
    in_range = d2 < (max_range + bound) ** 2
    Rm = np.asarray(quat_to_rotation_matrix(jnp.asarray(state.quat)))
    axis_w = np.einsum("nij,tj->nti", Rm, t_axis)
    along = np.einsum("nti,npi->ntp", axis_w, u)
    perp = np.sqrt(np.maximum(d2[:, None, :] - along**2, 0))
    visible = (perp * cos_half[None, :, None]
               - along * sin_half[None, :, None]) <= bound[:, None, :]
    mask = in_range[:, None, :] & visible
    flops_per_prim = np.array([_FLOPS[int(k)]
                               + (_FLOPS["common"] if k != 2 else 0)
                               for k in kinds])
    flops_real = float((mask * flops_per_prim[None, None, :]).sum()
                       * tile_rays)
    flops_all = float(flops_per_prim.sum() * tile_rays * tiles * N)

    t_np = max(t_real - t_cul, 1e-9)
    rec = {
        "study": f"kernel_ceiling_{tag}",
        "num_envs": N, "rays": R, "prims": P,
        "n_box": sc.n_box, "n_cyl": sc.n_cyl, "n_sph": sc.n_sph,
        "n_tri": sc.n_tri,
        "want_normals": want_normals,
        "visible_prims_per_tile_mean": round(float(mask.sum(-1).mean()), 1),
        "t_real_ms": round(t_real * 1e3, 3),
        "t_allvisible_ms": round(t_vis * 1e3, 3),
        "t_floor_ms": round(t_cul * 1e3, 3),
        "floor_fraction_pct": round(100 * t_cul / t_real, 1),
        "m_rays_per_s": round(N * R / t_real / 1e6, 1),
        "vpu_pct_whole_kernel": round(
            100 * flops_real / t_real / V5E_VPU_F32_FLOPS, 1),
        "vpu_pct_narrow_phase_only": round(
            100 * flops_real / t_np / V5E_VPU_F32_FLOPS, 1),
        "vpu_pct_allvisible": round(
            100 * flops_all / max(t_vis - t_cul, 1e-9) / V5E_VPU_F32_FLOPS,
            1),
    }
    print(json.dumps(rec))
    return rec


def rgb_breakdown(params, state, iters=20):
    """want_normals kernel alone vs the full render_rgb_camera program —
    locates the 43.9 ms (kernel? shade? unsplit transposes?)."""
    from aerial_gym_simulator_tpu.sensors.raycast_sensor import (
        render_camera, render_normal_faceid_camera, render_rgb_camera)

    t_depth = _timeit(jax.jit(
        lambda s: render_camera(params, s, want_seg=False)[0]), state,
        iters=iters)
    t_nf = _timeit(jax.jit(
        lambda s: render_normal_faceid_camera(params, s)[0]), state,
        iters=iters)
    t_rgb = _timeit(jax.jit(
        lambda s: render_rgb_camera(params, s)[0]), state, iters=iters)
    rec = {
        "study": "rgb_breakdown",
        "num_envs": int(state.pos.shape[0]),
        "depth_only_ms": round(t_depth * 1e3, 3),
        "normal_faceid_ms": round(t_nf * 1e3, 3),
        "rgb_ms": round(t_rgb * 1e3, 3),
        "normals_kernel_overhead_ms": round((t_nf - t_depth) * 1e3, 3),
        "shade_overhead_ms": round((t_rgb - t_nf) * 1e3, 3),
    }
    print(json.dumps(rec))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip_16k", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import aerial_gym_simulator_tpu as ag
    from aerial_gym_simulator_tpu.rl.ppo import enable_compilation_cache
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder

    enable_compilation_cache()
    small = jax.default_backend() == "cpu"

    # 1) nav shape: 1024 envs, nav scene (compiled Pallas — chip only; the
    # CPU backend would need interpret mode, minutes per variant)
    if not small:
        task = ag.task_registry.make_task("navigation_task",
                                          num_envs=1024, seed=0)
        carry = task.get_carry() if hasattr(task, "get_carry") else None
        state = carry.sim if carry is not None else task.state
        isolate("nav_1024env", task.params.scene, state, iters=20)
        isolate("nav_1024env_normals", task.params.scene, state,
                want_normals=True, iters=20)

    # 2) RGB pipeline breakdown on the camera env
    env = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                 "base_quadrotor_with_camera",
                                 "lee_velocity_control",
                                 num_envs=16 if small else 1024, seed=0)
    env.reset()
    rgb_breakdown(env.params, env.state, iters=3 if small else 20)

    # 3) bench scene at 16k envs (the 1.77 G rays/s question)
    if not (small or args.skip_16k):
        env16 = SimBuilder().build_env("base_sim", "env_with_obstacles",
                                       "base_quadrotor_with_camera",
                                       "lee_velocity_control",
                                       num_envs=16384, seed=0)
        env16.reset()
        isolate("bench_16kenv", env16.params.scene, env16.state, iters=5)


if __name__ == "__main__":
    main()
