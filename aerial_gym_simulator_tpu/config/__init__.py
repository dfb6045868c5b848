"""Config catalog + import-time registration of named configurations."""

from __future__ import annotations


def register_all():
    from ..registry.registries import (
        controller_registry,
        env_config_registry,
        robot_registry,
        sim_config_registry,
    )
    from .sim_config.base_sim_config import (
        BaseSimConfig,
        BaseSimHeadlessConfig,
        BaseSimNoGravityConfig,
        SimConfig2Ms,
        SimConfig4Ms,
    )
    from .env_config.base_env_config import EmptyEnvConfig
    from .env_config.obstacle_envs import (
        DynamicEnvironmentConfig,
        EnvWithObstaclesConfig,
        ForestEnvConfig,
        LidarNavObstaclesConfig,
    )
    from .robot_config import catalog as robot_catalog
    from .controller_config.lee_controller_config import (
        ControllerConfig,
        NoControlConfig,
        lee_controller_config,
    )

    sim_config_registry.register("base_sim", BaseSimConfig)
    sim_config_registry.register("base_sim_headless", BaseSimHeadlessConfig)
    sim_config_registry.register("base_sim_2ms", SimConfig2Ms)
    sim_config_registry.register("base_sim_4ms", SimConfig4Ms)
    sim_config_registry.register("base_sim_no_gravity", BaseSimNoGravityConfig)

    env_config_registry.register("empty_env", EmptyEnvConfig)
    env_config_registry.register("env_with_obstacles", EnvWithObstaclesConfig)
    env_config_registry.register("env_with_lidar_nav_obstacles", LidarNavObstaclesConfig)
    env_config_registry.register("forest_env", ForestEnvConfig)
    env_config_registry.register("dynamic_env", DynamicEnvironmentConfig)

    robot_catalog.register_robots(robot_registry)

    for name in (
        "lee_position_control",
        "lee_velocity_control",
        "lee_attitude_control",
        "lee_rates_control",
        "lee_acceleration_control",
        "lee_velocity_steering_angle_control",
        "fully_actuated_control",
    ):
        controller_registry.register(
            name, (lambda n: (lambda: lee_controller_config(n)))(name)
        )
    controller_registry.register("no_control", NoControlConfig)
