"""Pallas TPU ray-cast kernel — the hot render path.

TPU-native replacement for the reference's Warp CUDA ray-cast kernels
(wp.mesh_query_ray over a BVH, sensors/warp/warp_kernels/). Instead of a
divergence-heavy BVH traversal, each kernel instance owns a tile of rays
held in VMEM and sweeps the env's primitive soup (sorted by kind, scalar
data prefetched into SMEM) with three branch-free loops. Ray directions are
rotated to world in-kernel from the sensor quaternion — no (N, R, 3)
world-ray arrays ever touch HBM; traffic is O(prim tables + output images).

Layout:
  grid = (num_envs, ray_tiles); ray tile = (64, 128) = 8192 rays.
  dirs/mult: (ray_rows, 128) f32 static tables (sensor frame).
  pose:  (N, 1, 8)  [ox oy oz qx qy qz qw pad]      -> SMEM
  prims: (N, 19, P) [sx sy sz px py pz r00..r22 sem rox roy roz] -> SMEM
         (rox..roz = sensor origin pre-transformed into the prim frame;
         ATTRIBUTE-major: SMEM pads the minor dim to 128 lanes, so this
         costs 19 padded rows total instead of 512 B per primitive)
  mask:  (N*T, 1, P[+G]) i32 broad-phase visibility   -> SMEM
         (range + per-tile view-cone tests, precomputed on the VPU;
         G trailing group bits when the two-level triangle sweep is on)
  out:   depth (N, ray_rows, 128) f32, seg (N, ray_rows, 128) i32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raycast import (NO_HIT_RAY_VAL, NO_HIT_SEGMENTATION_VAL, RGB_AMBIENT,
                      SEG_ALBEDO, SKY_RGB, SUN_DIR)

_BIG = 1e10
# 64x128 = 8192 rays per kernel instance: amortizes the per-primitive scalar
# work (SMEM reads + per-prim dir rotation setup) over many rays while the
# per-tile view cone stays tight enough to cull (measured optimum on TPU:
# 16 rows 41.3 ms, 32 rows 32.5 ms, 64 rows 29.3 ms, 128 rows 32.2 ms for
# 1024 envs x 135x240 over the obstacle scene).
_TILE_ROWS = 64
_LANES = 128
TILE_RAYS = _TILE_ROWS * _LANES

# two-level triangle culling (reference BVH analog, warp_env_manager.py:
# 162-166): triangles are swept in chunks of this size, each chunk guarded
# by ONE scalar group-visibility bit (OR of its members' broad-phase bits,
# precomputed on the VPU). Scene triangles are laid out contiguously per
# mesh asset, so chunks are spatially coherent and a culled mesh costs
# n_tri/64 scalar tests instead of n_tri. Enabled from 2 groups up.
TRI_GROUP = 64


def _quat_rotate_tile(qx, qy, qz, qw, vx, vy, vz):
    """Rotate tile vectors (vx, vy, vz) by scalar quaternion (body->world)."""
    # t = 2 q_vec x v
    tx = 2.0 * (qy * vz - qz * vy)
    ty = 2.0 * (qz * vx - qx * vz)
    tz = 2.0 * (qx * vy - qy * vx)
    # v' = v + qw t + q_vec x t
    rx = vx + qw * tx + (qy * tz - qz * ty)
    ry = vy + qw * ty + (qz * tx - qx * tz)
    rz = vz + qw * tz + (qx * ty - qy * tx)
    return rx, ry, rz


def _safe_inv(x):
    """Guarded reciprocal: hardware approximate reciprocal + one Newton
    step instead of a full-precision divide (measured 16% kernel time at
    1024 envs x 135x240 — the box slab test spends 3 of these per
    primitive). Newton squares the ~4e-3 relative error of the raw
    approximation to ~1.4e-5, far inside the 2e-3 oracle-parity tolerance
    and the sensors' own noise floor."""
    x = jnp.where(jnp.abs(x) < 1e-12, jnp.where(x < 0, -1e-12, 1e-12), x)
    y = pl.reciprocal(x, approx=True)
    return y * (2.0 - x * y)


def _safe_inv_scalar(x):
    """Guarded reciprocal for SCALARS (pl.reciprocal only lowers for
    vectors; one scalar-core divide per primitive is free anyway)."""
    x = jnp.where(jnp.abs(x) < 1e-12, jnp.where(x < 0, -1e-12, 1e-12), x)
    return 1.0 / x


def _make_kernel(n_box: int, n_cyl: int, n_sph: int, n_tri: int,
                 max_range: float, tile_rows: int, want_seg: bool = True,
                 want_normals: bool = False, want_rgb: bool = False):
    P = n_box + n_cyl + n_sph + n_tri
    # sun direction as compile-time scalars (in-kernel Lambert shading)
    _SX, _SY, _SZ = (float(SUN_DIR[0]), float(SUN_DIR[1]), float(SUN_DIR[2]))

    def kernel(pose_ref, prim_ref, mask_ref, dx_ref, dy_ref, dz_ref, mult_ref,
               *outs):
        f_scr = nx_scr = ny_scr = nz_scr = l_scr = None
        face_ref = onx_ref = ony_ref = onz_ref = None
        r_ref = g_ref = b_ref = None
        if want_rgb:
            # RGB mode tracks one Lambert scalar |n.sun| per ray instead of
            # the full normal + face id (shading needs nothing else), and
            # shades in-kernel at tile end: 3 RGB planes + depth + seg out,
            # no face/normal image DMAs and no XLA-side shading pass.
            (depth_ref, seg_ref, r_ref, g_ref, b_ref,
             t_scr, s_scr, l_scr) = outs
        elif want_normals:
            (depth_ref, seg_ref, face_ref, onx_ref, ony_ref, onz_ref,
             t_scr, s_scr, f_scr, nx_scr, ny_scr, nz_scr) = outs
        elif want_seg:
            depth_ref, seg_ref, t_scr, s_scr = outs
        else:
            depth_ref, t_scr = outs
            seg_ref = s_scr = None
        ox = pose_ref[0, 0, 0]
        oy = pose_ref[0, 0, 1]
        oz = pose_ref[0, 0, 2]
        qx = pose_ref[0, 0, 3]
        qy = pose_ref[0, 0, 4]
        qz = pose_ref[0, 0, 5]
        qw = pose_ref[0, 0, 6]

        dxw, dyw, dzw = _quat_rotate_tile(qx, qy, qz, qw,
                                          dx_ref[:], dy_ref[:], dz_ref[:])

        t_scr[:] = jnp.full((tile_rows, _LANES), _BIG, jnp.float32)
        if want_seg or want_normals or want_rgb:
            s_scr[:] = jnp.full((tile_rows, _LANES),
                                float(NO_HIT_SEGMENTATION_VAL), jnp.float32)
        if want_rgb:
            l_scr[:] = jnp.zeros((tile_rows, _LANES), jnp.float32)
        if want_normals:
            f_scr[:] = jnp.full((tile_rows, _LANES), -1.0, jnp.float32)
            nx_scr[:] = jnp.zeros((tile_rows, _LANES), jnp.float32)
            ny_scr[:] = jnp.zeros((tile_rows, _LANES), jnp.float32)
            nz_scr[:] = jnp.zeros((tile_rows, _LANES), jnp.float32)

        def in_reach(p):
            """Scalar broad phase: one SMEM read per primitive.

            The mask is precomputed OUTSIDE the kernel in vectorized JAX
            (see _broadphase_mask): range test (skips obstacles parked at
            -1000 by the curriculum, reference asset_manager.py:72, and
            anything beyond max_range) AND a per-TILE view-cone test
            (camera tiles cover a narrow image strip; primitives behind or
            off-screen skip the whole vector narrow phase). Doing the math
            on the VPU outside keeps the kernel's scalar core free.
            """
            return mask_ref[0, 0, p] != 0

        def prim_common(p):
            sx = prim_ref[0, 0, p]
            sy = prim_ref[0, 1, p]
            sz = prim_ref[0, 2, p]
            r = [prim_ref[0, 6 + k, p] for k in range(9)]
            sem = prim_ref[0, 15, p]
            # origin in prim frame: precomputed outside (R^T (o - p))
            rox = prim_ref[0, 16, p]
            roy = prim_ref[0, 17, p]
            roz = prim_ref[0, 18, p]
            # dirs in prim frame: R^T d (tile math)
            rdx = r[0] * dxw + r[3] * dyw + r[6] * dzw
            rdy = r[1] * dxw + r[4] * dyw + r[7] * dzw
            rdz = r[2] * dxw + r[5] * dyw + r[8] * dzw
            return (sx, sy, sz, rox, roy, roz, rdx, rdy, rdz, sem, r)

        def update(t, sem):
            if want_seg:
                closer = t < t_scr[:]
                s_scr[:] = jnp.where(closer, sem, s_scr[:])
                t_scr[:] = jnp.where(closer, t, t_scr[:])
            else:
                # depth-only tasks (nav camera reads depth, seg unused):
                # one min instead of compare + two selects, no seg image DMA
                t_scr[:] = jnp.minimum(t_scr[:], t)

        def update_l(t, sem, l):
            """RGB mode: track the winning primitive's semantic id (albedo
            key) and its Lambert scalar |n.sun| — sign-invariant, so no
            normal orientation pass is needed (the oracle shade_rgb takes
            abs() of the oriented normal's dot with the sun)."""
            closer = t < t_scr[:]
            s_scr[:] = jnp.where(closer, sem, s_scr[:])
            l_scr[:] = jnp.where(closer, l, l_scr[:])
            t_scr[:] = jnp.where(closer, t, t_scr[:])

        def sun_in_prim(r):
            """R^T sun (scalar per prim): (R n_p).sun = n_p.(R^T sun) —
            lets Lambert run on the prim-frame normal with 3 tile mults
            instead of a 9-mult rotation to world."""
            return (r[0] * _SX + r[3] * _SY + r[6] * _SZ,
                    r[1] * _SX + r[4] * _SY + r[7] * _SZ,
                    r[2] * _SX + r[5] * _SY + r[8] * _SZ)

        def update_n(t, sem, p_idx, nxw, nyw, nzw):
            """Normals mode: also track the winning primitive index ("face
            id", reference warp_camera_kernels.py:68-121) and its WORLD
            surface normal. Same strict-< tie-break as update()/the oracle
            scan: the first primitive in table order wins ties."""
            closer = t < t_scr[:]
            s_scr[:] = jnp.where(closer, sem, s_scr[:])
            f_scr[:] = jnp.where(closer, float(p_idx), f_scr[:])
            nx_scr[:] = jnp.where(closer, nxw, nx_scr[:])
            ny_scr[:] = jnp.where(closer, nyw, ny_scr[:])
            nz_scr[:] = jnp.where(closer, nzw, nz_scr[:])
            t_scr[:] = jnp.where(closer, t, t_scr[:])

        def rot_to_world(r, nxp, nyp, nzp):
            """World normal = R @ n_prim (r is row-major, scalars)."""
            return (r[0] * nxp + r[1] * nyp + r[2] * nzp,
                    r[3] * nxp + r[4] * nyp + r[5] * nzp,
                    r[6] * nxp + r[7] * nyp + r[8] * nzp)

        def box_body(i):
            (sx, sy, sz, rox, roy, roz, rdx, rdy, rdz, sem, r) = prim_common(i)
            hx, hy, hz = 0.5 * sx, 0.5 * sy, 0.5 * sz
            ix, iy, iz = _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz)
            t1x, t2x = (-hx - rox) * ix, (hx - rox) * ix
            t1y, t2y = (-hy - roy) * iy, (hy - roy) * iy
            t1z, t2z = (-hz - roz) * iz, (hz - roz) * iz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t1x, t2x),
                                           jnp.minimum(t1y, t2y)),
                               jnp.minimum(t1z, t2z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t1x, t2x),
                                           jnp.maximum(t1y, t2y)),
                               jnp.maximum(t1z, t2z))
            hit = tmax >= jnp.maximum(tmin, 0.0)
            t = jnp.where(tmin > 0.0, tmin, tmax)
            t = jnp.where(hit & (t > 0.0), t, _BIG)
            if not (want_normals or want_rgb):
                update(t, sem)
                return
            # normal: dominant axis of |hit|/half in the prim frame (same
            # priority as the oracle's argmax: x wins ties, then y)
            px = rox + t * rdx
            py = roy + t * rdy
            pz = roz + t * rdz
            qx_ = jnp.abs(px) * _safe_inv_scalar(hx)
            qy_ = jnp.abs(py) * _safe_inv_scalar(hy)
            qz_ = jnp.abs(pz) * _safe_inv_scalar(hz)
            pickx = (qx_ >= qy_) & (qx_ >= qz_)
            picky = jnp.logical_not(pickx) & (qy_ >= qz_)
            if want_rgb:
                sux, suy, suz = sun_in_prim(r)
                lam = jnp.where(pickx, jnp.sign(px) * sux,
                                jnp.where(picky, jnp.sign(py) * suy,
                                          jnp.sign(pz) * suz))
                update_l(t, sem, jnp.abs(lam))
                return
            pickz = jnp.logical_not(pickx) & jnp.logical_not(picky)
            zero = jnp.zeros_like(px)
            nxp = jnp.where(pickx, jnp.sign(px), zero)
            nyp = jnp.where(picky, jnp.sign(py), zero)
            nzp = jnp.where(pickz, jnp.sign(pz), zero)
            update_n(t, sem, i, *rot_to_world(r, nxp, nyp, nzp))

        def cyl_body(i):
            p = n_box + i
            (sx, sy, sz, rox, roy, roz, rdx, rdy, rdz, sem, r) = prim_common(p)
            radius, half = sx, 0.5 * sy
            a = rdx * rdx + rdy * rdy
            b = rox * rdx + roy * rdy
            c = rox * rox + roy * roy - radius * radius
            disc = b * b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_a = _safe_inv(a)
            ts0 = (-b - sq) * inv_a
            ts1 = (-b + sq) * inv_a
            z0 = roz + ts0 * rdz
            z1 = roz + ts1 * rdz
            ok0 = (disc >= 0.0) & (ts0 > 0.0) & (jnp.abs(z0) <= half) & (a > 1e-12)
            ok1 = (disc >= 0.0) & (ts1 > 0.0) & (jnp.abs(z1) <= half) & (a > 1e-12)
            t_side = jnp.minimum(jnp.where(ok0, ts0, _BIG),
                                 jnp.where(ok1, ts1, _BIG))
            inv_dz = _safe_inv(rdz)
            tc0 = (half - roz) * inv_dz
            tc1 = (-half - roz) * inv_dz

            def cap_t(t):
                x = rox + t * rdx
                y = roy + t * rdy
                ok = (t > 0.0) & (x * x + y * y <= radius * radius)
                return jnp.where(ok, t, _BIG)

            t = jnp.minimum(t_side, jnp.minimum(cap_t(tc0), cap_t(tc1)))
            if not (want_normals or want_rgb):
                update(t, sem)
                return
            # side: radial (x, y, 0)/|.|; cap: (0, 0, sign z) — same 1e-4
            # cap tolerance as the oracle (primitive_normal)
            px = rox + t * rdx
            py = roy + t * rdy
            pz = roz + t * rdz
            on_cap = jnp.abs(jnp.abs(pz) - half) < 1e-4
            inv_len = jax.lax.rsqrt(jnp.maximum(px * px + py * py, 1e-18))
            if want_rgb:
                sux, suy, suz = sun_in_prim(r)
                lam = jnp.where(on_cap, jnp.sign(pz) * suz,
                                (px * sux + py * suy) * inv_len)
                update_l(t, sem, jnp.abs(lam))
                return
            nxp = jnp.where(on_cap, 0.0, px * inv_len)
            nyp = jnp.where(on_cap, 0.0, py * inv_len)
            nzp = jnp.where(on_cap, jnp.sign(pz), 0.0)
            update_n(t, sem, p, *rot_to_world(r, nxp, nyp, nzp))

        def sph_body(i):
            # spheres are rotation-invariant: intersect in WORLD frame with
            # the already-rotated tile dirs — skips the 15-op R^T rotation
            p = n_box + n_cyl + i
            radius = prim_ref[0, 0, p]
            sem = prim_ref[0, 15, p]
            rox = ox - prim_ref[0, 3, p]
            roy = oy - prim_ref[0, 4, p]
            roz = oz - prim_ref[0, 5, p]
            rdx, rdy, rdz = dxw, dyw, dzw
            b = rox * rdx + roy * rdy + roz * rdz
            c = rox * rox + roy * roy + roz * roz - radius * radius
            disc = b * b - c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t0_ = -b - sq
            t1_ = -b + sq
            t = jnp.where(t0_ > 0.0, t0_, t1_)
            t = jnp.where((disc >= 0.0) & (t > 0.0) & (radius > 0.0), t, _BIG)
            if not (want_normals or want_rgb):
                update(t, sem)
                return
            # radial normal, directly in world frame: (hit - center)/radius
            inv_r = _safe_inv_scalar(radius)
            if want_rgb:
                lam = ((rox + t * rdx) * _SX + (roy + t * rdy) * _SY
                       + (roz + t * rdz) * _SZ) * inv_r
                update_l(t, sem, jnp.abs(lam))
                return
            update_n(t, sem, p, (rox + t * rdx) * inv_r,
                     (roy + t * rdy) * inv_r, (roz + t * rdz) * inv_r)

        def tri_body(i):
            # triangle in its own frame: z = 0 plane, verts (0,0),(a,0),(b,c)
            # with (a,b,c) = the size slots (assets/mesh.py encoding);
            # two-sided plane hit + 2D barycentric inside test
            p = n_box + n_cyl + n_sph + i
            (sa, sb, sc_, rox, roy, roz, rdx, rdy, rdz, sem, r) = prim_common(p)
            t = -roz * _safe_inv(rdz)
            x = rox + t * rdx
            y = roy + t * rdy
            v = y * _safe_inv_scalar(sc_)    # sc_/sa are SCALARS: the
            u = (x - v * sb) * _safe_inv_scalar(sa)  # vector reciprocal op
            # does not lower for them (same fix as the normal-mode sizes)
            eps = 1e-6
            ok = ((t > 0.0) & (u >= -eps) & (v >= -eps)
                  & (u + v <= 1.0 + eps) & (sa > 0.0))
            t = jnp.where(ok, t, _BIG)
            if not (want_normals or want_rgb):
                update(t, sem)
                return
            if want_rgb:
                # plane normal is R column 3: Lambert is a pure SCALAR
                # (r2, r5, r8).sun — zero extra tile math for triangles
                lam = r[2] * _SX + r[5] * _SY + r[8] * _SZ
                update_l(t, sem, jnp.abs(lam) * jnp.ones_like(t))
                return
            # plane normal is +z in the triangle frame: world = R column 3
            # (scalar constants — no tile math at all)
            ones = jnp.ones_like(t)
            update_n(t, sem, p, r[2] * ones, r[5] * ones, r[8] * ones)

        # unrolled primitive sweeps (Mosaic software-pipelines the SMEM
        # scalar loads against the vector math; a fori_loop serializes them)
        # with a scalar broad-phase branch around each primitive's vector
        # work — culled/out-of-range primitives cost 1 scalar test only
        for i in range(n_box):
            pl.when(in_reach(i))(lambda i=i: box_body(i))
        for i in range(n_cyl):
            pl.when(in_reach(n_box + i))(lambda i=i: cyl_body(i))
        for i in range(n_sph):
            pl.when(in_reach(n_box + n_cyl + i))(lambda i=i: sph_body(i))
        P0 = n_box + n_cyl + n_sph
        if n_tri >= 2 * TRI_GROUP:
            # two-level sweep: group bits live at mask[P + g] (appended by
            # the caller); a whole culled chunk costs one scalar test
            n_groups = -(-n_tri // TRI_GROUP)
            for g in range(n_groups):
                lo, hi = g * TRI_GROUP, min(n_tri, (g + 1) * TRI_GROUP)

                def group_body(lo=lo, hi=hi):
                    for i in range(lo, hi):
                        pl.when(in_reach(P0 + i))(lambda i=i: tri_body(i))

                pl.when(mask_ref[0, 0, P + g] != 0)(group_body)
        else:
            for i in range(n_tri):
                pl.when(in_reach(P0 + i))(lambda i=i: tri_body(i))

        t_best = t_scr[:]
        miss = t_best >= jnp.minimum(max_range, 0.5 * _BIG)
        if want_rgb:
            # in-kernel Lambert shade (lockstep with the XLA oracle
            # shade_rgb in sensors/raycast_sensor.py): albedo by palette
            # select on the winning semantic id, shade = ambient +
            # (1-ambient)|n.sun|, distance fade on the TRUE depth
            # (mult_ref carries the caller's depth multiplier in this
            # mode), sky on miss. Palette selects run once per tile at
            # sweep end — per-primitive cost is only the extra Lambert
            # scratch select in update_l.
            s_best = jnp.where(miss, float(NO_HIT_SEGMENTATION_VAL), s_scr[:])
            seg_ref[0] = s_best.astype(jnp.int32)
            depth_px = t_best * mult_ref[:]
            depth_ref[0] = jnp.where(miss, NO_HIT_RAY_VAL, depth_px)
            shade = RGB_AMBIENT + (1.0 - RGB_AMBIENT) * l_scr[:]
            fade = 1.0 - 0.5 * jnp.clip(depth_px / max_range, 0.0, 1.0)
            lit = shade * fade
            n_pal = SEG_ALBEDO.shape[0]
            k = jnp.mod(jnp.abs(s_best), float(n_pal))
            for c, ref in ((0, r_ref), (1, g_ref), (2, b_ref)):
                albedo_c = jnp.zeros_like(lit)
                for pal_k in range(n_pal):
                    albedo_c = jnp.where(k == float(pal_k),
                                         float(SEG_ALBEDO[pal_k, c]),
                                         albedo_c)
                ref[0] = jnp.where(miss, float(SKY_RGB[c]), albedo_c * lit)
            return
        t_best = jnp.where(miss, NO_HIT_RAY_VAL, t_best)
        depth_ref[0] = t_best * mult_ref[:]
        if want_seg or want_normals:
            s_best = jnp.where(miss, float(NO_HIT_SEGMENTATION_VAL), s_scr[:])
            seg_ref[0] = s_best.astype(jnp.int32)
        if want_normals:
            # orient against the ray (oracle raycast_env_normals) and zero
            # the misses; faces are -1 where nothing was hit
            nx, ny, nz = nx_scr[:], ny_scr[:], nz_scr[:]
            flip = (nx * dxw + ny * dyw + nz * dzw) > 0.0
            sgn = jnp.where(flip, -1.0, 1.0)
            zero = jnp.zeros_like(nx)
            onx_ref[0] = jnp.where(miss, zero, sgn * nx)
            ony_ref[0] = jnp.where(miss, zero, sgn * ny)
            onz_ref[0] = jnp.where(miss, zero, sgn * nz)
            face_ref[0] = jnp.where(miss, -1.0, f_scr[:]).astype(jnp.int32)

    return kernel


def pack_pose(origin, quat):
    """(N,3),(N,4) -> (N,8) f32 pose table."""
    N = origin.shape[0]
    pad = jnp.zeros((N, 1), jnp.float32)
    return jnp.concatenate([origin, quat, pad], axis=-1).reshape(N, 1, 8)


def pack_prims_world(scene, obstacle_pos, obstacle_quat):
    """Compose asset poses with local prim transforms -> (N, P, 16) table.

    Done in plain JAX outside the kernel (tiny: P ~ 50). Table layout:
    [sx sy sz px py pz r00 r01 r02 r10 r11 r12 r20 r21 r22 sem].
    """
    from ..utils.math import quat_to_rotation_matrix

    slot = scene.env_prim_slot                                     # (N, P)
    # slot-select via one-hot batched matmul instead of take_along_axis:
    # TPU row gathers of small rows run ~2.5 ms each at 1024 envs x 59
    # prims (profiled) while the equivalent (N,P,A)x(N,A,d) einsum is
    # trivial MXU work
    A = obstacle_pos.shape[1]
    onehot = (slot[..., None] == jnp.arange(A)[None, None, :]).astype(
        obstacle_pos.dtype)                                        # (N, P, A)
    a_pos = jnp.einsum("npa,nad->npd", onehot, obstacle_pos)
    a_quat = jnp.einsum("npa,nad->npd", onehot, obstacle_quat)
    R_a = quat_to_rotation_matrix(a_quat)                          # (N,P,3,3)
    p_world = a_pos + jnp.einsum("npij,npj->npi", R_a, scene.env_prim_pos)
    R_w = jnp.einsum("npij,npjk->npik", R_a, scene.env_prim_rot)
    N, P = slot.shape
    return jnp.concatenate([
        scene.env_prim_size,
        p_world,
        R_w.reshape(N, P, 9),
        scene.env_prim_semantic[..., None].astype(jnp.float32),
    ], axis=-1)


@functools.partial(jax.jit, static_argnames=("n_box", "n_cyl", "n_sph",
                                             "n_tri", "max_range",
                                             "want_seg", "want_normals",
                                             "want_rgb", "interpret",
                                             "debug_force_mask"))
def raycast_pallas(pose, prims, dirs, mult, n_box: int, n_cyl: int,
                   n_sph: int, max_range: float, want_seg: bool = True,
                   interpret: bool = False, n_tri: int = 0,
                   want_normals: bool = False, want_rgb: bool = False,
                   debug_force_mask: str | None = None):
    """pose (N,8), prims (N,P,16), dirs (R,3) sensor-frame already rotated
    to WORLD per env? No — dirs are sensor-frame; pose quat rotates them
    in-kernel. dirs (R,3), mult (R,). R padded to TILE_RAYS internally.

    Returns depth (N, R), seg (N, R) int32 — seg is None when
    want_seg=False (depth-only sensors skip the seg scratch, the extra
    select per primitive, and the seg image DMA; measured ~6% kernel time
    at 1024 envs x 135x240).

    want_normals=True (implies seg) additionally returns the world-frame
    surface normal (N, R, 3) and hit primitive index "face id" (N, R)
    int32, -1 on miss — the training-rate path for the reference's
    NormalFaceID sensors (warp_camera_kernels.py:68-121); depth-only
    configs pay nothing. Returns (depth, seg[, normal, face]).

    want_rgb=True (exclusive with want_normals) Lambert-shades IN-KERNEL
    and returns (depth, seg, rgb (N, R, 3) f32 in [0, 1]) — the onboard
    RGB modality (reference isaacgym_camera_sensor.py IMAGE_COLOR) with
    no face/normal image DMAs and no XLA-side shading pass. In this mode
    `mult` must be the caller's real depth multiplier (the distance fade
    needs true depth in-kernel); depth comes back with it applied and
    NO_HIT_RAY_VAL exactly on misses. Lockstep oracle:
    sensors/raycast_sensor.py shade_rgb over raycast_batched_normals.
    """
    assert not (want_rgb and want_normals), (
        "want_rgb and want_normals are exclusive kernel modes")
    N = pose.shape[0]
    R = dirs.shape[0]
    # adaptive tile: small sensors (e.g. 8x8 ToF = 64 rays) must not pad
    # to the full 64x128 tile (127x wasted lanes); use the smallest
    # 8-row-multiple tile that covers R, capped at the measured optimum
    tile_rows = min(_TILE_ROWS, max(8, -(-R // _LANES // 8) * 8))
    tile_rays = tile_rows * _LANES
    R_pad = ((R + tile_rays - 1) // tile_rays) * tile_rays
    pad = R_pad - R
    # pad with the last real direction: keeps the per-tile direction cone
    # tight (zero-padding would widen the final tile's cone to 90 degrees)
    dirs_p = jnp.pad(dirs, ((0, pad), (0, 0)), mode="edge")
    mult_p = jnp.pad(mult, (0, pad))
    rows = R_pad // _LANES
    dx = dirs_p[:, 0].reshape(rows, _LANES)
    dy = dirs_p[:, 1].reshape(rows, _LANES)
    dz = dirs_p[:, 2].reshape(rows, _LANES)
    mt = mult_p.reshape(rows, _LANES)

    P = prims.shape[1]
    tiles = rows // tile_rows
    grid = (N, tiles)

    # ---- vectorized broad phase + origin pre-transform (VPU, not the
    # kernel's scalar core) -------------------------------------------------
    from ..utils.math import quat_rotate

    origin = pose[:, 0, 0:3]                                   # (N, 3)
    quat = pose[:, 0, 3:7]                                     # (N, 4)

    # per-tile bounding cone of ray directions (sensor frame): axis =
    # normalized mean dir; half-angle = max angle from axis over the tile.
    dirs_t = dirs_p.reshape(tiles, tile_rays, 3)
    unit = dirs_t / jnp.maximum(
        jnp.linalg.norm(dirs_t, axis=-1, keepdims=True), 1e-12)
    axis = jnp.sum(unit, axis=1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-12)
    cos_half = jnp.clip(jnp.min(jnp.einsum("tj,trj->tr", axis, unit),
                                axis=1), -1.0, 1.0)
    sin_half = jnp.sqrt(jnp.maximum(1.0 - cos_half * cos_half, 0.0))

    centers = prims[:, :, 3:6]                                 # (N, P, 3)
    # exact bounding-sphere radius per primitive kind (kind = static index
    # range): box half-diagonal, cylinder corner radius, sphere radius —
    # much tighter than the old sx+sy+sz over-estimate, so range and cone
    # culling both bite harder at zero runtime cost
    sx, sy, sz = prims[:, :, 0], prims[:, :, 1], prims[:, :, 2]
    r_box = 0.5 * jnp.sqrt(sx * sx + sy * sy + sz * sz)
    r_cyl = jnp.sqrt(sx * sx + 0.25 * sy * sy)
    # triangle: bounding sphere about v0 covering both edges
    r_tri = jnp.maximum(sx, jnp.sqrt(sy * sy + sz * sz))
    kind = np.zeros((P,), np.int32)
    kind[n_box:n_box + n_cyl] = 1
    kind[n_box + n_cyl:n_box + n_cyl + n_sph] = 2
    kind[n_box + n_cyl + n_sph:] = 3
    kind = jnp.asarray(kind)[None, :]
    bound = jnp.where(kind == 0, r_box,
                      jnp.where(kind == 1, r_cyl,
                                jnp.where(kind == 3, r_tri, sx)))  # (N, P)
    u = centers - origin[:, None, :]                           # (N, P, 3)
    d2 = jnp.sum(u * u, axis=-1)                               # (N, P)
    reach = max_range + bound
    in_range = d2 < reach * reach                              # (N, P)
    # cone axes to world per env: (N, T, 3)
    axis_w = quat_rotate(quat[:, None, :], axis[None, :, :])
    along = jnp.einsum("ntj,npj->ntp", axis_w, u)              # (N, T, P)
    perp = jnp.sqrt(jnp.maximum(d2[:, None, :] - along * along, 0.0))
    # signed distance of the bounding-sphere center to the cone boundary
    # (exact for along >= 0, conservative behind the apex; degenerates to
    # always-true for 360-degree sensors where cos=-1, sin=0)
    visible = (perp * cos_half[None, :, None]
               - along * sin_half[None, :, None]) <= bound[:, None, :]
    mask = (in_range[:, None, :] & visible).astype(jnp.int32)  # (N, T, P)
    if debug_force_mask == "ones":       # perf isolation: no culling at all
        mask = jnp.ones_like(mask)
    elif debug_force_mask == "zeros":    # perf isolation: fixed-floor only
        mask = jnp.zeros_like(mask)
    if n_tri >= 2 * TRI_GROUP:
        # group visibility bits for the two-level triangle sweep: OR over
        # each 64-triangle chunk (VPU reshape+max — the kernel then guards
        # a whole chunk with one scalar test)
        n_groups = -(-n_tri // TRI_GROUP)
        P0 = n_box + n_cyl + n_sph
        tri_mask = mask[:, :, P0:P0 + n_tri]
        pad_g = n_groups * TRI_GROUP - n_tri
        tri_mask = jnp.pad(tri_mask, ((0, 0), (0, 0), (0, pad_g)))
        group_bits = jnp.max(
            tri_mask.reshape(N, tiles, n_groups, TRI_GROUP), axis=-1)
        mask = jnp.concatenate([mask, group_bits], axis=-1)    # (N, T, P+G)
    P_mask = mask.shape[-1]
    mask = mask.reshape(N * tiles, 1, P_mask)

    # prim-frame sensor origin R^T (o - p): appended to the prim table so
    # the kernel skips 12 scalar ops per primitive (note o - p = -u)
    R_w = prims[:, :, 6:15].reshape(N, P, 3, 3)
    ro = jnp.einsum("npji,npj->npi", R_w, -u)   # R^T (o-p), R row-major
    prims = jnp.concatenate([prims, ro], axis=-1)              # (N, P, 19)
    # ATTRIBUTE-major SMEM layout (N, 19, P): SMEM windows pad the minor
    # dim to 128 lanes, so prim-major rows cost 512 B each (2 MB at 2048
    # triangles -- exceeds the 1 MB SMEM budget, measured round 3);
    # attribute-major packs all P prims into 19 padded rows (~160 KB).
    prims = jnp.transpose(prims, (0, 2, 1))                    # (N, 19, P)

    if want_normals or want_rgb:
        want_seg = True
    kernel = _make_kernel(n_box, n_cyl, n_sph, n_tri, max_range, tile_rows,
                          want_seg, want_normals, want_rgb)
    tile_spec = pl.BlockSpec((1, tile_rows, _LANES), lambda e, j: (e, j, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((N, rows, _LANES), jnp.float32)]
    scratch_shapes = [pltpu.VMEM((tile_rows, _LANES), jnp.float32)]  # t_best
    if want_seg:
        out_specs.append(tile_spec)
        out_shape.append(jax.ShapeDtypeStruct((N, rows, _LANES), jnp.int32))
        scratch_shapes.append(pltpu.VMEM((tile_rows, _LANES), jnp.float32))
    if want_rgb:
        out_specs.extend([tile_spec] * 3)       # r, g, b planes
        out_shape.extend([jax.ShapeDtypeStruct((N, rows, _LANES),
                                               jnp.float32)] * 3)
        scratch_shapes.append(                   # lambert |n.sun|
            pltpu.VMEM((tile_rows, _LANES), jnp.float32))
    if want_normals:
        out_specs.extend([tile_spec] * 4)       # face, nx, ny, nz
        out_shape.append(jax.ShapeDtypeStruct((N, rows, _LANES), jnp.int32))
        out_shape.extend([jax.ShapeDtypeStruct((N, rows, _LANES),
                                               jnp.float32)] * 3)
        scratch_shapes.extend(                   # f, nx, ny, nz
            [pltpu.VMEM((tile_rows, _LANES), jnp.float32)] * 4)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda e, j: (e, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 19, P), lambda e, j: (e, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, P_mask),
                         lambda e, j, T=tiles: (e * T + j, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_rows, _LANES), lambda e, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, _LANES), lambda e, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, _LANES), lambda e, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, _LANES), lambda e, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(pose, prims, mask, dx, dy, dz, mt)

    depth = outs[0].reshape(N, R_pad)[:, :R]
    if not want_seg:
        return depth, None
    seg = outs[1].reshape(N, R_pad)[:, :R]
    if want_rgb:
        rgb = jnp.stack([o.reshape(N, R_pad)[:, :R] for o in outs[2:5]],
                        axis=-1)
        return depth, seg, rgb
    if not want_normals:
        return depth, seg
    face = outs[2].reshape(N, R_pad)[:, :R]
    normal = jnp.stack([o.reshape(N, R_pad)[:, :R] for o in outs[3:6]],
                       axis=-1)
    return depth, seg, normal, face
