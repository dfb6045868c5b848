"""Sensor configuration catalog.

Parity with reference config/sensor_config/: depth cameras (base, RealSense
D455, ToF ST VL53L5CX 8x8, stereo, normal/faceID), lidars (base OS0-128,
OS0/OS1/OS2-64/128, OSDome, 2D scanner, fake radar cone), IMU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class SensorNoiseConfig:
    enable_sensor_noise: bool = False
    std_a: float = 0.00001
    std_b: float = 0.00001
    std_c: float = 0.00001
    mean_offset: float = 0.0
    pixel_dropout_prob: float = 0.01


@dataclass
class BaseDepthCameraConfig:
    num_sensors: int = 1
    sensor_type: str = "camera"
    height: int = 135
    width: int = 240
    horizontal_fov_deg: float = 87.000
    max_range: float = 10.0
    min_range: float = 0.2
    calculate_depth: bool = True
    return_pointcloud: bool = False
    pointcloud_in_world_frame: bool = False
    segmentation_camera: bool = True
    euler_frame_rot_deg: List[float] = field(default_factory=lambda: [-90.0, 0.0, -90.0])
    normalize_range: bool = True
    randomize_placement: bool = True
    min_translation: List[float] = field(default_factory=lambda: [0.07, -0.06, 0.01])
    max_translation: List[float] = field(default_factory=lambda: [0.12, 0.03, 0.04])
    min_euler_rotation_deg: List[float] = field(default_factory=lambda: [-5.0, -5.0, -5.0])
    max_euler_rotation_deg: List[float] = field(default_factory=lambda: [5.0, 5.0, 5.0])
    nominal_position: List[float] = field(default_factory=lambda: [0.10, 0.0, 0.03])
    nominal_orientation_euler_deg: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    sensor_noise: SensorNoiseConfig = field(default_factory=SensorNoiseConfig)
    stereo_baseline: float = 0.0

    @property
    def far_out_of_range_value(self) -> float:
        return self.max_range if self.normalize_range else -1.0

    @property
    def near_out_of_range_value(self) -> float:
        return -self.max_range if self.normalize_range else -1.0


@dataclass
class NavDepthCameraConfig(BaseDepthCameraConfig):
    """270x480 depth camera used by the navigation task (reference
    navigation_task_config: VAE consumes 270x480)."""
    height: int = 270
    width: int = 480


@dataclass
class RsD455Config(BaseDepthCameraConfig):
    """RealSense D455 (reference d455_depth_config.py)."""
    height: int = 270
    width: int = 480
    horizontal_fov_deg: float = 87.0
    max_range: float = 15.0
    min_range: float = 0.2


# The reference ships the same sensor under two module/class names
# (d455_depth_config.py RsD455Config and intel_realsense_d455_config.py
# IntelRealSenseD455Config, byte-identical bodies) — keep both importable.
IntelRealSenseD455Config = RsD455Config


@dataclass
class TofCameraConfig(BaseDepthCameraConfig):
    """ST VL53L5CX 8x8 ToF array (reference lmf_tof_camera_config.py)."""
    height: int = 8
    width: int = 8
    horizontal_fov_deg: float = 45.0
    max_range: float = 4.0
    min_range: float = 0.02


@dataclass
class LuxonisOakDConfig(BaseDepthCameraConfig):
    """Luxonis OAK-D stereo depth (reference luxonis_oak_d_config.py:
    fixed mount, no segmentation, noise disabled)."""
    height: int = 270
    width: int = 480
    horizontal_fov_deg: float = 72.0
    max_range: float = 12.0
    min_range: float = 0.7
    segmentation_camera: bool = False
    randomize_placement: bool = False
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, pixel_dropout_prob=0.01))


@dataclass
class LuxonisOakDProWConfig(BaseDepthCameraConfig):
    """Luxonis OAK-D Pro W wide-FOV (reference luxonis_oak_d_pro_w_config.py)."""
    height: int = 270
    width: int = 480
    horizontal_fov_deg: float = 127.0
    max_range: float = 12.0
    min_range: float = 0.2
    segmentation_camera: bool = False
    randomize_placement: bool = False
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, pixel_dropout_prob=0.01))


@dataclass
class StereoCameraConfig(BaseDepthCameraConfig):
    """Stereo pair: right camera offset by baseline along sensor -y; returns
    disparity-consistent depth (reference warp_stereo_camera_kernels.py)."""
    height: int = 270
    width: int = 480
    stereo_baseline: float = 0.095


@dataclass
class BaseNormalFaceIDCameraConfig(BaseDepthCameraConfig):
    """Returns surface normals + face (primitive) ids for dataset generation."""
    segmentation_camera: bool = True
    calculate_depth: bool = False


@dataclass
class BaseLidarConfig:
    num_sensors: int = 1
    sensor_type: str = "lidar"
    height: int = 128                  # scan lines
    width: int = 512                   # points per line
    horizontal_fov_deg_min: float = -180.0
    horizontal_fov_deg_max: float = 180.0
    vertical_fov_deg_min: float = -45.0
    vertical_fov_deg_max: float = 45.0
    max_range: float = 10.0
    min_range: float = 0.2
    calculate_depth: bool = False      # lidar returns range, not depth
    return_pointcloud: bool = False
    pointcloud_in_world_frame: bool = False
    segmentation_camera: bool = True
    euler_frame_rot_deg: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    normalize_range: bool = True
    randomize_placement: bool = True
    min_translation: List[float] = field(default_factory=lambda: [0.07, -0.06, 0.01])
    max_translation: List[float] = field(default_factory=lambda: [0.12, 0.03, 0.04])
    min_euler_rotation_deg: List[float] = field(default_factory=lambda: [-5.0, -5.0, -5.0])
    max_euler_rotation_deg: List[float] = field(default_factory=lambda: [5.0, 5.0, 5.0])
    nominal_position: List[float] = field(default_factory=lambda: [0.10, 0.0, 0.03])
    nominal_orientation_euler_deg: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=True, std_a=1e-5, std_b=1e-5, std_c=1e-5,
            mean_offset=-0.05, pixel_dropout_prob=0.0))
    # Out-of-range sentinels. The reference computes these at CLASS-BODY
    # time (base_lidar_config.py:48-55), so subclasses that override
    # max_range without redefining the expression inherit the PARENT's
    # sentinel (e.g. OS1-64: max_range 90 but sentinel +-35 from
    # OS_0_128_Config). None = derive from this config's own
    # normalize_range/max_range; explicit values reproduce the reference's
    # inherited (stale) sentinels where they differ.
    far_out_of_range_value: Optional[float] = None
    near_out_of_range_value: Optional[float] = None

    def __post_init__(self):
        if self.far_out_of_range_value is None:
            self.far_out_of_range_value = (
                self.max_range if self.normalize_range else -1.0)
        if self.near_out_of_range_value is None:
            self.near_out_of_range_value = (
                -self.max_range if self.normalize_range else -1.0)


@dataclass
class LidarNavConfig(BaseLidarConfig):
    """48x120 lidar used by the lidar navigation task
    (reference lidar_navigation_task: min-pooled to 16x20)."""
    height: int = 48
    width: int = 120
    vertical_fov_deg_min: float = -22.5
    vertical_fov_deg_max: float = 22.5


@dataclass
class OS0_64Config(BaseLidarConfig):
    """Ouster OS0-64 (reference os0_64_config.py:9-14)."""
    height: int = 64
    width: int = 512
    vertical_fov_deg_min: float = -45.0
    vertical_fov_deg_max: float = 45.0
    max_range: float = 35.0
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.36239104e-05,
            std_b=-3.17199061e-04, std_c=9.61903860e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.0))


@dataclass
class OS0_128Config(BaseLidarConfig):
    """Ouster OS0-128 (reference os0_128_config.py:50-55)."""
    height: int = 128
    width: int = 512
    vertical_fov_deg_min: float = -45.0
    vertical_fov_deg_max: float = 45.0
    max_range: float = 35.0
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.36239104e-05,
            std_b=-3.17199061e-04, std_c=9.61903860e-03,
            mean_offset=-0.05, pixel_dropout_prob=0.0))


@dataclass
class OS1_64Config(BaseLidarConfig):
    """Ouster OS1-64 (reference os1_64_config.py:13-22)."""
    height: int = 64
    width: int = 512
    vertical_fov_deg_min: float = -22.5
    vertical_fov_deg_max: float = 22.5
    max_range: float = 90.0
    min_range: float = 0.7
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.08287454e-06,
            std_b=-4.07347360e-06, std_c=5.30757302e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.0))
    # inherited-stale sentinel from OS_0_128_Config (see BaseLidarConfig)
    far_out_of_range_value: Optional[float] = 35.0
    near_out_of_range_value: Optional[float] = -35.0


@dataclass
class OS2_128Config(BaseLidarConfig):
    height: int = 128
    width: int = 512
    vertical_fov_deg_min: float = -11.25
    vertical_fov_deg_max: float = 11.25
    max_range: float = 240.0


@dataclass
class OS2_64Config(BaseLidarConfig):
    """Ouster OS2-64 (reference os2_64_config.py; noise disabled with the
    reference's documented stds)."""
    height: int = 64
    width: int = 512
    vertical_fov_deg_min: float = -11.25
    vertical_fov_deg_max: float = 11.25
    max_range: float = 200.0
    min_range: float = 0.7
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.08287454e-06,
            std_b=-4.07347360e-06, std_c=5.30757302e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.0))
    # inherited-stale sentinel from OS_0_128_Config (see BaseLidarConfig)
    far_out_of_range_value: Optional[float] = 35.0
    near_out_of_range_value: Optional[float] = -35.0


@dataclass
class PmdFlexx2Config(BaseLidarConfig):
    """pmd flexx2 ToF flash lidar (reference pmd_flexx2_config.py:
    no segmentation, wider mount ranges, noise disabled)."""
    height: int = 172
    width: int = 224
    horizontal_fov_deg_min: float = -28.0
    horizontal_fov_deg_max: float = 28.0
    vertical_fov_deg_min: float = -22.0
    vertical_fov_deg_max: float = 22.0
    max_range: float = 5.0
    min_range: float = 0.2
    segmentation_camera: bool = False
    min_translation: List[float] = field(
        default_factory=lambda: [0.07, -0.06, 0.02])
    max_translation: List[float] = field(
        default_factory=lambda: [0.12, 0.03, 0.06])
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.08287454e-06,
            std_b=-4.07347360e-06, std_c=5.30757302e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.01))


@dataclass
class StVL53L5CXConfig(BaseLidarConfig):
    """ST VL53L5CX 8x8 ToF (reference st_vl53l5cx_config.py: raw-meter
    ranges with -1.0 out-of-range sentinel, fixed mount, no segmentation,
    noise disabled)."""
    height: int = 8
    width: int = 8
    horizontal_fov_deg_min: float = -45.0
    horizontal_fov_deg_max: float = 45.0
    vertical_fov_deg_min: float = -45.0
    vertical_fov_deg_max: float = 45.0
    max_range: float = 4.0
    min_range: float = 0.2
    segmentation_camera: bool = False
    normalize_range: bool = False
    randomize_placement: bool = False
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.08287454e-06,
            std_b=-4.07347360e-06, std_c=5.30757302e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.0))


@dataclass
class OSDome_64Config(BaseLidarConfig):
    """Dome lidar: upper hemisphere (reference osdome_64_config.py:12-32:
    fixed mount, noise disabled with dome stds)."""
    height: int = 64
    width: int = 512
    vertical_fov_deg_min: float = 0.0
    vertical_fov_deg_max: float = 90.0
    max_range: float = 20.0
    min_range: float = 0.5
    randomize_placement: bool = False
    min_translation: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    max_translation: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    min_euler_rotation_deg: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    max_euler_rotation_deg: List[float] = field(default_factory=lambda: [0.0, 0.0, 0.0])
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=0.00038089,
            std_b=-0.00343351, std_c=0.01553284,
            mean_offset=-0.025, pixel_dropout_prob=0.0))
    # inherited-stale sentinel from BaseLidarConfig (max_range here is 20)
    far_out_of_range_value: Optional[float] = 10.0
    near_out_of_range_value: Optional[float] = -10.0


@dataclass
class RSLidarAiryConfig(BaseLidarConfig):
    """Robosense Airy dome lidar, 48x120 world-frame pointcloud (reference
    rslidar_airy_config.py; used by the magpie robot / lidar nav task)."""
    height: int = 48
    width: int = 120
    horizontal_fov_deg_min: float = -180.0
    horizontal_fov_deg_max: float = 180.0
    vertical_fov_deg_min: float = 0.0
    vertical_fov_deg_max: float = 90.0
    max_range: float = 10.0
    min_range: float = 0.2
    return_pointcloud: bool = True
    pointcloud_in_world_frame: bool = True
    segmentation_camera: bool = False
    normalize_range: bool = False
    # reference rslidar_airy_config.py:21-34: deterministic -5 cm / -90 deg
    # pitch mount (sensor looks up through the dome), noise disabled
    min_translation: List[float] = field(default_factory=lambda: [-0.05, 0.0, 0.0])
    max_translation: List[float] = field(default_factory=lambda: [-0.05, 0.0, 0.0])
    min_euler_rotation_deg: List[float] = field(default_factory=lambda: [0.0, -90.0, 0.0])
    max_euler_rotation_deg: List[float] = field(default_factory=lambda: [0.0, -90.0, 0.0])
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=0.00038089,
            std_b=-0.00343351, std_c=0.01553284,
            mean_offset=-0.025, pixel_dropout_prob=0.0))
    # inherited-stale sentinel from BaseLidarConfig (the reference class
    # body never recomputes it for the world-frame pointcloud mode)
    far_out_of_range_value: Optional[float] = 10.0
    near_out_of_range_value: Optional[float] = -10.0


@dataclass
class FakeRadarConfig(BaseLidarConfig):
    """Radar cone simulated via lidar-style rendering (reference
    fake_radar_config.py: 48x120 rays over a +-60 deg cone, world-frame
    pointcloud consumed by the radar navigation task)."""
    height: int = 48
    width: int = 120
    horizontal_fov_deg_min: float = -60.0
    horizontal_fov_deg_max: float = 60.0
    vertical_fov_deg_min: float = -60.0
    vertical_fov_deg_max: float = 60.0
    max_range: float = 10.0
    min_range: float = 0.2
    return_pointcloud: bool = True
    pointcloud_in_world_frame: bool = True
    segmentation_camera: bool = False
    normalize_range: bool = False
    # reference fake_radar_config.py:54-70
    min_translation: List[float] = field(
        default_factory=lambda: [0.07, -0.06, 0.02])
    max_translation: List[float] = field(
        default_factory=lambda: [0.12, 0.03, 0.06])
    sensor_noise: SensorNoiseConfig = field(
        default_factory=lambda: SensorNoiseConfig(
            enable_sensor_noise=False, std_a=3.08287454e-06,
            std_b=-4.07347360e-06, std_c=5.30757302e-03,
            mean_offset=-0.025, pixel_dropout_prob=0.01))


@dataclass
class Lidar2DConfig(BaseLidarConfig):
    """Planar 2D scanner (reference lidar_2d_config.py)."""
    height: int = 1
    width: int = 1024
    vertical_fov_deg_min: float = 0.0
    vertical_fov_deg_max: float = 0.0


@dataclass
class BaseImuConfig:
    """Reference imu_config/base_imu_config.py: the base class carries
    VN100-sampled noise data; noise/bias terms are gated by enable_noise /
    enable_bias; biases re-init uniform in +-max_bias_init_value; the
    mount orientation is perturbed within +-2 deg when
    randomize_placement (imu_sensor.py:47-56, :133-139)."""
    num_sensors: int = 1
    sensor_type: str = "imu"
    world_frame: bool = False
    enable_noise: bool = True
    enable_bias: bool = True
    # base_imu_config.py:16-31
    accel_noise_std: List[float] = field(default_factory=lambda: [
        0.001688956233495657, 0.001688956233495657, 0.001688956233495657])
    gyro_noise_std: List[float] = field(default_factory=lambda: [
        0.0010679343003532472, 0.0010679343003532472, 0.0010679343003532472])
    accel_bias_std: List[float] = field(default_factory=lambda: [
        9.782812831313576e-07, 9.782812831313576e-07, 9.782812831313576e-07])
    gyro_bias_std: List[float] = field(default_factory=lambda: [
        2.6541629581345176e-05, 2.6541629581345176e-05, 2.6541629581345176e-05])
    # base_imu_config.py:32-48
    max_measurement_acceleration: float = 100.0
    max_measurement_angular_velocity: float = 10.0
    max_bias_init_value: List[float] = field(
        default_factory=lambda: [1e-3] * 6)
    gravity_compensation: bool = False
    randomize_placement: bool = False
    min_euler_rotation_deg: List[float] = field(
        default_factory=lambda: [-2.0, -2.0, -2.0])
    max_euler_rotation_deg: List[float] = field(
        default_factory=lambda: [2.0, 2.0, 2.0])


@dataclass
class BoschBmi088Config(BaseImuConfig):
    """Bosch BMI088 (reference bosch_bmi088_config.py noise data)."""
    accel_noise_std: List[float] = field(
        default_factory=lambda: [0.001569064, 0.001569064, 0.0018632635])
    gyro_noise_std: List[float] = field(
        default_factory=lambda: [0.0002443461, 0.0002443461, 0.0002443461])
    accel_bias_std: List[float] = field(
        default_factory=lambda: [0.001356466, 0.001356466, 0.001356466])
    gyro_bias_std: List[float] = field(
        default_factory=lambda: [1.43527e-05, 1.43527e-05, 1.43527e-05])
    randomize_placement: bool = True


@dataclass
class VN100Config(BaseImuConfig):
    """VectorNav VN-100 (reference vn100_config.py noise data)."""
    accel_noise_std: List[float] = field(
        default_factory=lambda: [0.001372931, 0.001372931, 0.001372931])
    gyro_noise_std: List[float] = field(
        default_factory=lambda: [6.1086524e-05, 6.1086524e-05, 6.1086524e-05])
    accel_bias_std: List[float] = field(
        default_factory=lambda: [9.7828128e-07, 9.7828128e-07, 9.7828128e-07])
    gyro_bias_std: List[float] = field(
        default_factory=lambda: [2.6541630e-05, 2.6541630e-05, 2.6541630e-05])
    randomize_placement: bool = True
