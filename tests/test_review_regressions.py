"""Regressions for the round-1 code-review findings."""

import os
import signal
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

import aerial_gym_simulator_tpu as ag
from aerial_gym_simulator_tpu.tasks.position_setpoint_variants import (
    EndToEndConfig,
    ReconfigurableConfig,
    _scale_actions,
)


def test_symmetric_action_scaling_maps_zero_to_midrange():
    """end_to_end/px4 policies are zero-mean Gaussians: action 0 must map to
    mid-range thrust, not minimum (reference clamp(-1,1) + midpoint)."""
    cfg = EndToEndConfig()
    out = np.asarray(_scale_actions(cfg, jnp.zeros((1, 4))))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)     # (0.2 + 1.2) / 2
    lo = np.asarray(_scale_actions(cfg, -jnp.ones((1, 4))))
    hi = np.asarray(_scale_actions(cfg, jnp.ones((1, 4))))
    np.testing.assert_allclose(lo, 0.2, atol=1e-6)
    np.testing.assert_allclose(hi, 1.2, atol=1e-6)


def test_ratio_action_scaling_for_reconfigurable():
    cfg = ReconfigurableConfig()
    out = np.asarray(_scale_actions(cfg, jnp.zeros((1, 16))))
    np.testing.assert_allclose(out[0, :6], 0.0, atol=1e-6)   # motors at min
    np.testing.assert_allclose(out[0, 6:], 1.0, atol=1e-6)   # joints at +1


def test_variant_reset_idx_respected():
    """reset_idx must be visible to the next step (carry re-sync)."""
    t = ag.task_registry.make_task("position_setpoint_task_sim2real",
                                   num_envs=4, seed=0)
    t.reset()
    t.step(jnp.zeros((4, 4)))
    moved = t._carry.sim.replace(pos=t._carry.sim.pos + 100.0)
    t.sim_env.state = moved
    t._carry = t._carry._replace(sim=moved)
    t.reset_idx(jnp.arange(4))
    # the reset must have replaced the displaced positions in the carry
    assert float(jnp.abs(t._carry.sim.pos).max()) < 50.0


def test_native_parser_survives_malformed_attribute():
    """Malformed attribute characters must not hang the C++ XML parser."""
    from aerial_gym_simulator_tpu.assets import native_loader
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    bad = ('<robot name="x"><link name="a" ! >'
           '<inertial><mass value="1"/>'
           '<inertia ixx="1" iyy="1" izz="1"/></inertial>'
           '</link></robot>')
    with tempfile.NamedTemporaryFile("w", suffix=".urdf", delete=False) as f:
        f.write(bad)
        path = f.name
    try:
        signal.alarm(30)           # fail loudly instead of hanging forever
        m = native_loader.load_urdf_native(path)
        signal.alarm(0)
        assert m is None or m.mass == 1.0
    finally:
        os.unlink(path)


def test_native_string_compile_used_for_procedural_assets():
    from aerial_gym_simulator_tpu.assets import native_loader, procedural
    from aerial_gym_simulator_tpu.assets import urdf as pyurdf
    if not native_loader.native_available():
        pytest.skip("native compiler not available")
    text = procedural.box_urdf("b", (0.3, 0.2, 0.1))
    m = native_loader.load_urdf_string_native(text)
    assert m is not None
    m2 = pyurdf.load_urdf_string(text)   # routed through native by default
    np.testing.assert_allclose(m.inertia, m2.inertia, atol=1e-6)


def test_avi_stream_header_well_formed(tmp_path):
    """AVISTREAMHEADER must be 56 bytes with dwLength = frame count."""
    import struct
    from aerial_gym_simulator_tpu.sim.sim_builder import SimBuilder
    from aerial_gym_simulator_tpu.viewer import OfflineViewer
    env = SimBuilder().build_env("base_sim", "empty_env", "base_quadrotor",
                                 "no_control", num_envs=1, seed=0)
    env.reset()
    v = OfflineViewer(env.params, width=32, height=24)
    for _ in range(3):
        v.render(env.state)
    path = str(tmp_path / "a.avi")
    v.save_avi(path, fps=5)
    data = open(path, "rb").read()
    i = data.index(b"strh")
    size = struct.unpack("<I", data[i + 4:i + 8])[0]
    assert size == 56
    payload = data[i + 8:i + 8 + size]
    scale, rate, start, length = struct.unpack("<IIII", payload[20:36])
    assert (scale, rate, start, length) == (1, 5, 0, 3)
    # no AVIF_HASINDEX without an idx1 chunk
    j = data.index(b"avih")
    flags = struct.unpack("<I", data[j + 8 + 12:j + 8 + 16])[0]
    assert flags & 0x10 == 0
