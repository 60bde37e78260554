"""Honor JAX_PLATFORMS on machines where a hardware PJRT plugin's
registration overrides the env var.

Without this, ``JAX_PLATFORMS=cpu python tool.py`` still initializes (and,
when the device tunnel is down, hangs on) the hardware backend. The CLI
and every tool call :func:`apply_platform_env` before first touching a
backend; tests get the same effect from tests/conftest.py."""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
