"""Task registration (reference task/__init__.py:55-135)."""

from __future__ import annotations


def register_all():
    from ..registry.registries import task_registry
    from .position_setpoint_task import (
        PositionSetpointTask,
        PositionSetpointTaskConfig,
    )

    task_registry.register_task(
        "position_setpoint_task", PositionSetpointTask, PositionSetpointTaskConfig
    )
