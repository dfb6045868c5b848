"""Debug-mode switches (SURVEY 5.2 build equivalent).

JAX's functional purity removes the reference's class of in-place race
bugs; what remains useful is numeric tripwires:

  * ``enable_nan_checks()`` — jax_debug_nans: any NaN produced inside a
    jitted function raises at the offending primitive (re-runs un-jitted).
  * ``enable_disable_jit()`` — run everything op-by-op for printf-style
    debugging of task/dynamics code.
"""

from __future__ import annotations

import jax

from .logging import CustomLogger

logger = CustomLogger("debug")


def enable_nan_checks(on: bool = True):
    jax.config.update("jax_debug_nans", on)
    logger.info(f"jax_debug_nans = {on}")


def enable_disable_jit(on: bool = True):
    jax.config.update("jax_disable_jit", on)
    logger.info(f"jax_disable_jit = {on}")
