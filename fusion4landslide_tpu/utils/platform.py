"""Backend/platform selection helper.

In some environments a site hook registers an accelerator plugin and
force-overrides ``jax_platforms`` at interpreter start, so the usual
``JAX_PLATFORMS`` env var is ignored. ``apply_platform_from_env()`` restores
user control: set ``F4L_PLATFORM=cpu`` (or any platform string) and call it
before first jax use — every CLI driver and the test conftest do.
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_from_env"]


def apply_platform_from_env(default: str | None = None) -> None:
    platform = os.environ.get("F4L_PLATFORM", default)
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
