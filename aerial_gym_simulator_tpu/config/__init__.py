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
    from .env_config.base_env_config import EmptyEnvConfig, EmptyEnv2MsConfig
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
        lmf2_controller_config,
        magpie_controller_config,
        octarotor_controller_config,
        rov_fully_actuated_controller_config,
    )

    sim_config_registry.register("base_sim", BaseSimConfig)
    sim_config_registry.register("base_sim_headless", BaseSimHeadlessConfig)
    sim_config_registry.register("base_sim_2ms", SimConfig2Ms)
    sim_config_registry.register("base_sim_4ms", SimConfig4Ms)
    sim_config_registry.register("base_sim_no_gravity", BaseSimNoGravityConfig)
    # User-template config, unregistered like the reference
    # (sim/__init__.py:19-20):
    # sim_config_registry.register("custom_sim", CustomSimConfig)

    env_config_registry.register("empty_env", EmptyEnvConfig)
    env_config_registry.register("empty_env_2ms", EmptyEnv2MsConfig)
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

    # robot-specific gain sets, "{robot}_{mode}_control" like the reference's
    # register_robot_controllers (control/__init__.py:61-99)
    def _register_robot_family(robot, factory):
        for mode in ("position", "velocity", "attitude", "rates", "acceleration"):
            base = f"lee_{mode}_control"
            controller_registry.register(
                f"{robot}_{mode}_control",
                (lambda f, b: (lambda: _with_base(f, b)))(factory, base),
            )

    def _with_base(factory, base):
        cfg = factory(base)
        cfg.base_controller = base
        return cfg

    _register_robot_family("magpie", magpie_controller_config)
    _register_robot_family("lmf2", lmf2_controller_config)
    _register_robot_family("octarotor", octarotor_controller_config)

    def _rov_ctrl():
        cfg = rov_fully_actuated_controller_config()
        cfg.base_controller = "fully_actuated_control"
        return cfg

    controller_registry.register("rov_fully_actuated_control", _rov_ctrl)
