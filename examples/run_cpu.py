"""Run any example forced onto the CPU backend.

Usage:  python examples/run_cpu.py examples/<script>.py [script args...]

Some TPU platform plugins initialize at first device use and ignore
JAX_PLATFORMS; when no TPU is reachable that first use hangs. This
wrapper pins the backend with jax.config BEFORE anything touches a
device (same trick as tests/conftest.py), then executes the script
unmodified.
"""

import runpy
import sys

import jax


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    jax.config.update("jax_platforms", "cpu")
    script = sys.argv[1]
    sys.argv = sys.argv[1:]
    runpy.run_path(script, run_name="__main__")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
