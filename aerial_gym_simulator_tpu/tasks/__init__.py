"""Task registration (reference task/__init__.py:55-135)."""

from __future__ import annotations


def register_all():
    from ..registry.registries import task_registry
    from .position_setpoint_task import (
        PositionSetpointTask,
        PositionSetpointTaskConfig,
    )
    from .navigation_task import NavigationTask, NavigationTaskConfig

    task_registry.register_task(
        "position_setpoint_task", PositionSetpointTask, PositionSetpointTaskConfig
    )
    task_registry.register_task(
        "navigation_task", NavigationTask, NavigationTaskConfig
    )
