"""Differential data parity of the sensor-config catalog vs the REFERENCE.

Imports every sensor config module under the reference's
aerial_gym/config/sensor_config/ standalone (the config tree only needs
numpy) and asserts our dataclass configs carry the same numbers:
resolution, FOV, ranges, mount randomization, and the quadratic noise
model coefficients the warp_sensor noise chain consumes
(warp_sensor.py:229-247).

Config values are data parity (CLAUDE.md): the reference classes are the
oracle.
"""

import importlib
import os
import sys
import types

import pytest

REF = "/root/reference/aerial_gym/config/sensor_config"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")

from aerial_gym_simulator_tpu.config.sensor_config import (  # noqa: E402
    sensor_configs as S,
)


@pytest.fixture(scope="module")
def ref_sensor_modules():
    """Import the reference sensor-config package without triggering
    aerial_gym/__init__ (which needs isaacgym)."""
    for pkgname, path in [
        ("aerial_gym", os.path.dirname(os.path.dirname(REF))),
        ("aerial_gym.config", os.path.dirname(REF)),
        ("aerial_gym.config.sensor_config", REF),
        ("aerial_gym.config.sensor_config.camera_config", REF + "/camera_config"),
        ("aerial_gym.config.sensor_config.lidar_config", REF + "/lidar_config"),
        ("aerial_gym.config.sensor_config.imu_config", REF + "/imu_config"),
    ]:
        if pkgname not in sys.modules:
            m = types.ModuleType(pkgname)
            m.__path__ = [path]
            sys.modules[pkgname] = m
    mods = {}
    for sub in ("camera_config", "lidar_config", "imu_config"):
        for f in sorted(os.listdir(os.path.join(REF, sub))):
            if f.endswith(".py") and f != "__init__.py":
                mods[f[:-3]] = importlib.import_module(
                    f"aerial_gym.config.sensor_config.{sub}.{f[:-3]}")
    return mods


def _ref_class(mod):
    """The single config class defined in a reference sensor module."""
    classes = [getattr(mod, a) for a in dir(mod)
               if isinstance(getattr(mod, a), type)
               and getattr(mod, a).__module__ == mod.__name__]
    assert len(classes) == 1, mod.__name__
    return classes[0]


# reference module -> our dataclass
CAMERA_PAIRS = {
    "base_depth_camera_config": S.BaseDepthCameraConfig,
    "d455_depth_config": S.RsD455Config,
    "intel_realsense_d455_config": S.IntelRealSenseD455Config,
    "luxonis_oak_d_config": S.LuxonisOakDConfig,
    "luxonis_oak_d_pro_w_config": S.LuxonisOakDProWConfig,
    "stereo_camera_config": S.StereoCameraConfig,
}
LIDAR_PAIRS = {
    "base_lidar_config": S.BaseLidarConfig,
    "os0_64_config": S.OS0_64Config,
    "os0_128_config": S.OS0_128Config,
    "os1_64_config": S.OS1_64Config,
    "os2_64_config": S.OS2_64Config,
    "osdome_64_config": S.OSDome_64Config,
    "rslidar_airy_config": S.RSLidarAiryConfig,
    "st_vl53l5cx_config": S.StVL53L5CXConfig,
    "pmd_flexx2_config": S.PmdFlexx2Config,
    "fake_radar_config": S.FakeRadarConfig,
}

CAMERA_FIELDS = [
    "num_sensors", "height", "width", "horizontal_fov_deg",
    "max_range", "min_range", "calculate_depth", "return_pointcloud",
    "normalize_range", "segmentation_camera", "randomize_placement",
    "min_translation", "max_translation",
    "min_euler_rotation_deg", "max_euler_rotation_deg",
]
LIDAR_FIELDS = [
    "num_sensors", "height", "width",
    "horizontal_fov_deg_min", "horizontal_fov_deg_max",
    "vertical_fov_deg_min", "vertical_fov_deg_max",
    "max_range", "min_range", "return_pointcloud",
    "pointcloud_in_world_frame", "segmentation_camera", "normalize_range",
    "randomize_placement", "min_translation", "max_translation",
    "min_euler_rotation_deg", "max_euler_rotation_deg",
    "euler_frame_rot_deg",
]
# Reference camera noise classes define only enable/dropout (plus a
# pixel_std_dev_multiplier that warp_sensor.py:229-247 never reads — the
# noise chain consumes std_a/b/c for every sensor type).
NOISE_FIELDS = ["enable_sensor_noise", "pixel_dropout_prob"]
LIDAR_NOISE_FIELDS = NOISE_FIELDS + ["mean_offset", "std_a", "std_b", "std_c"]


def _assert_fields_match(ref_cls, our_cfg, fields, label):
    for f in fields:
        ref_v = getattr(ref_cls, f)
        our_v = getattr(our_cfg, f)
        if isinstance(ref_v, (list, tuple)):
            assert list(ref_v) == pytest.approx(list(our_v)), (label, f)
        elif isinstance(ref_v, bool):
            assert bool(our_v) == ref_v, (label, f)
        else:
            assert float(our_v) == pytest.approx(float(ref_v)), (label, f)


@pytest.mark.parametrize("ref_name", sorted(CAMERA_PAIRS))
def test_camera_config_matches_reference(ref_sensor_modules, ref_name):
    ref_cls = _ref_class(ref_sensor_modules[ref_name])
    ours = CAMERA_PAIRS[ref_name]()
    _assert_fields_match(ref_cls, ours, CAMERA_FIELDS, ref_name)
    _assert_fields_match(ref_cls.sensor_noise, ours.sensor_noise,
                         NOISE_FIELDS, ref_name + ".noise")
    # out-of-range sentinels derive from max_range/normalize_range
    assert float(ours.far_out_of_range_value) == pytest.approx(
        float(ref_cls.far_out_of_range_value)), ref_name
    assert float(ours.near_out_of_range_value) == pytest.approx(
        float(ref_cls.near_out_of_range_value)), ref_name


@pytest.mark.parametrize("ref_name", sorted(LIDAR_PAIRS))
def test_lidar_config_matches_reference(ref_sensor_modules, ref_name):
    ref_cls = _ref_class(ref_sensor_modules[ref_name])
    ours = LIDAR_PAIRS[ref_name]()
    _assert_fields_match(ref_cls, ours, LIDAR_FIELDS, ref_name)
    _assert_fields_match(ref_cls.sensor_noise, ours.sensor_noise,
                         LIDAR_NOISE_FIELDS, ref_name + ".noise")
    assert float(ours.far_out_of_range_value) == pytest.approx(
        float(ref_cls.far_out_of_range_value)), ref_name
    assert float(ours.near_out_of_range_value) == pytest.approx(
        float(ref_cls.near_out_of_range_value)), ref_name


IMU_PAIRS = {
    "base_imu_config": S.BaseImuConfig,
    "bosch_bmi088_config": S.BoschBmi088Config,
    "vn100_config": S.VN100Config,
}


@pytest.mark.parametrize("ref_name", sorted(IMU_PAIRS))
def test_imu_config_matches_reference(ref_sensor_modules, ref_name):
    """The reference packs accel|gyro into 6-vectors (bias_std,
    imu_noise_std, max_measurement_value, max_bias_init_value,
    base_imu_config.py:16-48); ours splits them into 3-vectors."""
    import numpy as np
    ref_cls = _ref_class(ref_sensor_modules[ref_name])
    ours = IMU_PAIRS[ref_name]()
    np.testing.assert_allclose(ours.accel_noise_std,
                               ref_cls.imu_noise_std[:3], rtol=1e-6)
    np.testing.assert_allclose(ours.gyro_noise_std,
                               ref_cls.imu_noise_std[3:], rtol=1e-6)
    np.testing.assert_allclose(ours.accel_bias_std,
                               ref_cls.bias_std[:3], rtol=1e-6)
    np.testing.assert_allclose(ours.gyro_bias_std,
                               ref_cls.bias_std[3:], rtol=1e-6)
    assert float(ours.max_measurement_acceleration) == pytest.approx(
        float(ref_cls.max_measurement_value[0]))
    assert float(ours.max_measurement_angular_velocity) == pytest.approx(
        float(ref_cls.max_measurement_value[3]))
    np.testing.assert_allclose(ours.max_bias_init_value,
                               ref_cls.max_bias_init_value, rtol=1e-6)
    assert bool(ours.world_frame) == bool(ref_cls.world_frame)
    assert bool(ours.enable_noise) == bool(ref_cls.enable_noise)
    assert bool(ours.enable_bias) == bool(ref_cls.enable_bias)
    assert bool(ours.gravity_compensation) == bool(ref_cls.gravity_compensation)
    assert bool(ours.randomize_placement) == bool(ref_cls.randomize_placement)
    np.testing.assert_allclose(ours.min_euler_rotation_deg,
                               ref_cls.min_euler_rotation_deg)
    np.testing.assert_allclose(ours.max_euler_rotation_deg,
                               ref_cls.max_euler_rotation_deg)
