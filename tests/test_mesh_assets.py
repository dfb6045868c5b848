"""Triangle-mesh asset path (assets/mesh.py + kind-3 primitives).

The reference loads URDF ``<mesh>`` trimeshes and ray casts them with Warp
BVH queries (assets/warp_asset.py:14-143). Here meshes become triangle
primitives in the same soup the TPU kernels sweep. Validation:

  * STL/OBJ loaders round-trip a generated icosphere,
  * rendering a sphere MESH matches the ANALYTIC sphere to tessellation
    accuracy (differential render test on a non-box mesh),
  * the Pallas kernel (interpret mode) stays in lockstep with the oracle,
  * the collision SDF sees the mesh surface.
"""

import os
import struct as _struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aerial_gym_simulator_tpu.assets import mesh as meshlib
from aerial_gym_simulator_tpu.assets import urdf as urdflib
from aerial_gym_simulator_tpu.envs.collision import primitive_sdf
from aerial_gym_simulator_tpu.ops import raycast as rc
from aerial_gym_simulator_tpu.ops import raycast_pallas as rp


def _icosphere(subdiv=2, radius=1.0):
    """Subdivided icosahedron (verts, faces) — standalone numpy."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mid = {}
        verts = list(v)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                mid[key] = len(verts)
                verts.append(m)
            return mid[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(nf)
    return v * radius, f


def _write_binary_stl(path, verts, faces):
    with open(path, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(_struct.pack("<I", len(faces)))
        for tri in faces:
            fh.write(_struct.pack("<3f", 0, 0, 0))  # normal (recomputed)
            for vi in tri:
                fh.write(_struct.pack("<3f", *verts[vi]))
            fh.write(_struct.pack("<H", 0))


def _write_obj(path, verts, faces):
    with open(path, "w") as fh:
        for vv in verts:
            fh.write(f"v {vv[0]} {vv[1]} {vv[2]}\n")
        for ff in faces:
            fh.write(f"f {ff[0] + 1} {ff[1] + 1} {ff[2] + 1}\n")


@pytest.fixture(scope="module")
def sphere_stl(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshes")
    v, f = _icosphere(subdiv=2, radius=0.8)
    p = str(d / "sphere.stl")
    _write_binary_stl(p, v, f)
    return p, v, f


def test_stl_and_obj_loaders_roundtrip(sphere_stl, tmp_path):
    p, v, f = sphere_stl
    lv, lf = meshlib.load_mesh(p)
    assert len(lf) == len(f)
    assert np.allclose(np.sort(np.linalg.norm(lv, axis=1)), 0.8, atol=1e-5)
    po = str(tmp_path / "sphere.obj")
    _write_obj(po, v, f)
    ov, of = meshlib.load_mesh(po)
    assert len(of) == len(f) and len(ov) == len(v)


def test_decimation_respects_budget(sphere_stl):
    _, v, f = sphere_stl
    dv, df = meshlib.decimate_vertex_clustering(v, f, budget=100)
    assert 0 < len(df) <= 100
    # decimated surface still spans the sphere
    assert np.linalg.norm(dv, axis=1).max() <= 0.81
    assert np.linalg.norm(dv, axis=1).min() >= 0.5


def _mesh_urdf(stl_path):
    return f"""<?xml version="1.0"?>
<robot name="meshobj">
  <link name="base_link">
    <inertial><mass value="1.0"/>
      <inertia ixx="0.1" ixy="0" ixz="0" iyy="0.1" iyz="0" izz="0.1"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0" rpy="0 0 0"/>
      <geometry><mesh filename="{os.path.basename(stl_path)}"/></geometry>
    </collision>
  </link>
</robot>
"""


@pytest.fixture(scope="module")
def mesh_prims(sphere_stl, tmp_path_factory):
    """Parse a URDF that references the STL -> triangle primitive arrays."""
    p, _, f = sphere_stl
    d = os.path.dirname(p)
    up = os.path.join(d, "meshobj.urdf")
    with open(up, "w") as fh:
        fh.write(_mesh_urdf(p))
    # lift the decimation budget so the subdiv-2 icosphere (320 faces)
    # passes through exactly (the budget path is tested separately)
    old = meshlib.DEFAULT_TRIANGLE_BUDGET
    meshlib.DEFAULT_TRIANGLE_BUDGET = 512
    try:
        model = urdflib.load_urdf(up)
    finally:
        meshlib.DEFAULT_TRIANGLE_BUDGET = old
    tris = [pr for pr in model.primitives if pr.kind == "triangle"]
    assert len(tris) == len(f), "every face becomes one triangle primitive"
    P = len(tris)
    kind = np.full((P,), 3, np.int32)
    size = np.stack([t.size for t in tris]).astype(np.float32)
    pos = np.stack([t.xyz for t in tris]).astype(np.float32)
    rot = np.stack([t.rot for t in tris]).astype(np.float32)
    sem = np.ones((P,), np.int32)
    slot = np.zeros((P,), np.int32)
    return kind, size, pos, rot, sem, slot, model


def _rays(n=256, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    return (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)


def test_mesh_render_matches_analytic_sphere(mesh_prims):
    """Differential render: depth to the sphere MESH == analytic sphere
    depth to tessellation accuracy (subdiv-2 icosphere chord error < 2%)."""
    kind, size, pos, rot, sem, slot, model = mesh_prims
    ro = jnp.asarray([3.0, 0.0, 0.0], jnp.float32)
    # aim most rays at points inside the sphere, keep some wild ones (misses)
    rng = np.random.RandomState(0)
    targets = rng.uniform(-0.6, 0.6, size=(192, 3))
    aimed = targets - np.asarray(ro)
    aimed /= np.linalg.norm(aimed, axis=1, keepdims=True)
    rd = jnp.asarray(np.concatenate([aimed, _rays(64)]).astype(np.float32))
    asset_pos = jnp.zeros((1, 3), jnp.float32)
    asset_quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    t, s = rc.raycast_env(jnp.asarray(kind), jnp.asarray(size),
                          jnp.asarray(pos), jnp.asarray(rot),
                          jnp.asarray(sem), jnp.asarray(slot),
                          asset_pos, asset_quat, ro, rd, 100.0)
    t = np.asarray(t)
    # analytic sphere r=0.8 at origin from (3,0,0)
    b = np.einsum("j,rj->r", np.asarray(ro), np.asarray(rd))
    c = 9.0 - 0.64
    disc = b * b - c
    t_ref = -b - np.sqrt(np.maximum(disc, 0.0))
    # exclude the silhouette band (the inscribed polyhedron is thinner than
    # the sphere by 1 - cos of the half edge angle: rim rays with
    # disc < r^2 - r_in^2 ~ 0.013 may legitimately miss) and away-rays
    hit = (disc > 0.02) & (t_ref > 0.0)
    assert hit.sum() > 20, "test needs a healthy number of hitting rays"
    np.testing.assert_allclose(t[hit], t_ref[hit], atol=0.06)  # chord error x oblique-incidence factor
    assert (t[disc < -1e-3] == rc.NO_HIT_RAY_VAL).all()
    assert (np.asarray(s)[hit] == 1).all(), "mesh semantic id propagates"


def test_mesh_pallas_matches_oracle(mesh_prims):
    """Interpret-mode Pallas kernel in lockstep with the oracle on the
    triangle soup (the repo's renderer invariant)."""
    kind, size, pos, rot, sem, slot, model = mesh_prims
    ro = jnp.asarray([[2.5, 0.3, -0.2]], jnp.float32)
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    rd = jnp.asarray(-_rays(128, seed=3))
    asset_pos = jnp.zeros((1, 1, 3), jnp.float32)
    asset_quat = jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], jnp.float32)

    t_or, _ = rc.raycast_env(jnp.asarray(kind), jnp.asarray(size),
                             jnp.asarray(pos), jnp.asarray(rot),
                             jnp.asarray(sem), jnp.asarray(slot),
                             asset_pos[0], asset_quat[0], ro[0], rd, 100.0)

    class _Sc:
        env_prim_slot = jnp.asarray(slot)[None]
        env_prim_kind = jnp.asarray(kind)[None]
        env_prim_size = jnp.asarray(size)[None]
        env_prim_pos = jnp.asarray(pos)[None]
        env_prim_rot = jnp.asarray(rot)[None]
        env_prim_semantic = jnp.asarray(sem)[None]

    prims = rp.pack_prims_world(_Sc, asset_pos, asset_quat)
    t_pl, _ = rp.raycast_pallas(rp.pack_pose(ro, quat), prims, rd,
                                jnp.ones((128,), jnp.float32),
                                0, 0, 0, 100.0, want_seg=False,
                                interpret=True, n_tri=int(kind.shape[0]))
    np.testing.assert_allclose(np.asarray(t_pl)[0], np.asarray(t_or),
                               atol=2e-3)


def test_triangle_sdf():
    """Point-triangle distance: hand-checked cases on a unit right triangle
    (a=1, b=0, c=1 -> verts (0,0),(1,0),(0,1) in the z=0 plane)."""
    size = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    kind = jnp.asarray(3, jnp.int32)
    cases = [
        ([0.25, 0.25, 0.5], 0.5),          # above interior -> plane dist
        ([0.25, 0.25, -0.5], 0.5),         # below (unsigned)
        ([2.0, 0.0, 0.0], 1.0),            # beyond vertex (1,0)
        ([-1.0, -1.0, 0.0], np.sqrt(2.0)), # beyond vertex (0,0)
        ([0.5, 0.5, 0.0], 0.0),            # on hypotenuse
        ([1.0, 1.0, 0.0], np.sqrt(2.0) / 2.0),  # off hypotenuse
    ]
    for p, want in cases:
        d = float(primitive_sdf(kind, size, jnp.asarray(p, jnp.float32)))
        np.testing.assert_allclose(d, want, atol=1e-5, err_msg=str(p))
    # gradient finite everywhere incl. on the surface
    g = jax.grad(lambda p: primitive_sdf(kind, size, p))(
        jnp.asarray([0.5, 0.5, 0.0], jnp.float32))
    assert bool(jnp.isfinite(g).all())


def test_highpoly_mesh_grouped_pallas_matches_oracle(tmp_path):
    """A >5k-triangle STL (subdiv-4 icosphere, 5120 faces) decimated to the
    default 2048 budget, rendered through the Pallas kernel's two-level
    grouped triangle sweep (TRI_GROUP chunks behind one scalar visibility
    bit — the reference-BVH analog, warp_env_manager.py:162-166) vs the
    oracle. Also exercises group CULLING: the sensor looks away for half
    the rays, so some chunks are masked off entirely."""
    v, f = _icosphere(subdiv=4, radius=1.0)
    assert len(f) == 5120
    p = str(tmp_path / "hipoly.stl")
    _write_binary_stl(p, v, f)

    # decimate to 512 (not the 2048 default) for suite time: interpret-mode
    # tracing is O(n_tri) python work (~5 min at 2048); the grouped kernel
    # path is identical from 128 triangles up, and the full-2048 compiled
    # path is exercised on chip (PERF.md round-3 dense-mesh entry)
    v0, rot, size = meshlib.mesh_to_triangle_prims(p, budget=512)
    P = len(size)
    assert 128 <= P <= 512, "grouped sweep must be active (>=2 chunks)"
    kind = np.full((P,), 3, np.int32)
    sem = np.full((P,), 1, np.int32)
    slot = np.zeros((P,), np.int32)

    ro = jnp.asarray([[3.0, 0.1, -0.1]], jnp.float32)
    quat = jnp.asarray([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    # half the rays aimed at the sphere, half pointing away (culled groups)
    rng = np.random.RandomState(5)
    targets = rng.uniform(-0.5, 0.5, size=(96, 3))
    aimed = targets - np.asarray(ro[0])
    aimed /= np.linalg.norm(aimed, axis=1, keepdims=True)
    away = rng.randn(32, 3)
    away[:, 0] = np.abs(away[:, 0]) + 0.5          # +x: away from origin
    away /= np.linalg.norm(away, axis=1, keepdims=True)
    rd = jnp.asarray(np.concatenate([aimed, away]).astype(np.float32))

    asset_pos = jnp.zeros((1, 1, 3), jnp.float32)
    asset_quat = jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    t_or, _ = rc.raycast_env(jnp.asarray(kind),
                             jnp.asarray(size, jnp.float32),
                             jnp.asarray(v0, jnp.float32),
                             jnp.asarray(rot, jnp.float32),
                             jnp.asarray(sem), jnp.asarray(slot),
                             asset_pos[0], asset_quat[0], ro[0], rd, 100.0)

    class _Sc:
        env_prim_slot = jnp.asarray(slot)[None]
        env_prim_kind = jnp.asarray(kind)[None]
        env_prim_size = jnp.asarray(size, jnp.float32)[None]
        env_prim_pos = jnp.asarray(v0, jnp.float32)[None]
        env_prim_rot = jnp.asarray(rot, jnp.float32)[None]
        env_prim_semantic = jnp.asarray(sem)[None]

    prims = rp.pack_prims_world(_Sc, asset_pos, asset_quat)
    t_pl, _ = rp.raycast_pallas(rp.pack_pose(ro, quat), prims, rd,
                                jnp.ones((rd.shape[0],), jnp.float32),
                                0, 0, 0, 100.0, want_seg=False,
                                interpret=True, n_tri=P)
    t_or, t_pl = np.asarray(t_or), np.asarray(t_pl)[0]
    np.testing.assert_allclose(t_pl, t_or, atol=2e-3)
    # the away-rays must report a miss through the grouped path too
    assert (t_pl[96:] == rc.NO_HIT_RAY_VAL).all()
    # and aimed rays hit the meshed sphere near the analytic depth
    hits = t_or[:96] < rc.NO_HIT_RAY_VAL * 0.9
    assert hits.mean() > 0.9
