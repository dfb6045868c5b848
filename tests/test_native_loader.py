"""Native C++ scene compiler: parity with the Python URDF parser."""

import glob
import os
import time

import numpy as np
import pytest

from aerial_gym_simulator_tpu.assets import native_loader, procedural
from aerial_gym_simulator_tpu.assets import urdf as pyurdf

URDF_SAMPLE = """<?xml version="1.0"?>
<robot name="test_bot">
  <!-- a comment to exercise the parser -->
  <link name="base_link">
    <inertial>
      <origin xyz="0.01 0.02 0.03" rpy="0.1 0.2 0.3"/>
      <mass value="0.8"/>
      <inertia ixx="0.004" ixy="0.0001" ixz="0.0" iyy="0.005" iyz="0.0" izz="0.006"/>
    </inertial>
    <collision>
      <origin xyz="0 0 0.05" rpy="0 0 0.5"/>
      <geometry><box size="0.3 0.2 0.1"/></geometry>
    </collision>
  </link>
  <link name="arm">
    <inertial>
      <mass value="0.2"/>
      <inertia ixx="0.001" ixy="0" ixz="0" iyy="0.001" iyz="0" izz="0.001"/>
    </inertial>
    <collision>
      <geometry><cylinder radius="0.04" length="0.5"/></geometry>
    </collision>
    <visual>
      <geometry><sphere radius="0.02"/></geometry>
    </visual>
  </link>
  <joint name="j1" type="revolute">
    <parent link="base_link"/>
    <child link="arm"/>
    <origin xyz="0.2 0 0.1" rpy="0 0.3 0"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def sample_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("urdf") / "test_bot.urdf"
    p.write_text(URDF_SAMPLE)
    return str(p)


def _compare_models(a: pyurdf.UrdfModel, b: pyurdf.UrdfModel):
    assert abs(a.mass - b.mass) < 1e-5
    np.testing.assert_allclose(a.com, b.com, atol=1e-5)
    np.testing.assert_allclose(a.inertia, b.inertia, atol=1e-5)
    assert abs(a.bound_radius - b.bound_radius) < 1e-4
    assert len(a.primitives) == len(b.primitives)
    for pa, pb in zip(a.primitives, b.primitives):
        assert pa.kind == pb.kind
        np.testing.assert_allclose(pa.size, pb.size, atol=1e-6)
        np.testing.assert_allclose(pa.xyz, pb.xyz, atol=1e-6)
        np.testing.assert_allclose(pa.rot, pb.rot, atol=1e-6)
        assert pa.semantic_id == pb.semantic_id


def test_native_matches_python_on_sample(sample_path):
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    py = pyurdf._parse_urdf_tree(
        __import__("xml.etree.ElementTree", fromlist=["ET"]).fromstring(
            URDF_SAMPLE), sample_path)
    nat = native_loader.load_urdf_native(sample_path)
    assert nat is not None
    _compare_models(py, nat)


def test_native_matches_python_on_procedural_robots(tmp_path):
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    alloc = [[0, 0, 0, 0], [0, 0, 0, 0], [1, 1, 1, 1],
             [-0.13, -0.13, 0.13, 0.13], [-0.13, 0.13, 0.13, -0.13],
             [-0.01, 0.01, -0.01, 0.01]]
    positions = procedural.motor_layout_from_allocation(alloc)
    text = procedural.multirotor_urdf(name="q", motor_positions=positions)
    p = tmp_path / "q.urdf"
    p.write_text(text)
    py = pyurdf.load_urdf_string(text, name=str(p))
    nat = native_loader.load_urdf_native(str(p))
    assert nat is not None
    _compare_models(py, nat)


def test_native_per_link_semantics(sample_path):
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    nat = native_loader.load_urdf_native(sample_path, per_link_semantic=True)
    sems = [p.semantic_id for p in nat.primitives]
    assert sems == [0, 1]     # base_link -> 0, arm -> 1


def test_native_batch_parallel(sample_path, tmp_path):
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    paths = []
    for i in range(32):
        p = tmp_path / f"b{i}.urdf"
        p.write_text(URDF_SAMPLE)
        paths.append(str(p))
    models = native_loader.load_urdf_batch(paths, num_threads=4)
    assert models is not None and len(models) == 32
    ref = native_loader.load_urdf_native(paths[0])
    for m in models:
        assert abs(m.mass - ref.mass) < 1e-6
        assert len(m.primitives) == len(ref.primitives)


def test_load_urdf_uses_native_transparently(sample_path):
    """The public load_urdf entry produces the same model whether the native
    path is enabled or forced off."""
    m_auto = pyurdf.load_urdf(sample_path)
    os.environ["AERIAL_GYM_TPU_NATIVE_LOADER"] = "0"
    try:
        m_py = pyurdf.load_urdf(sample_path)
    finally:
        os.environ.pop("AERIAL_GYM_TPU_NATIVE_LOADER")
    _compare_models(m_py, m_auto)
