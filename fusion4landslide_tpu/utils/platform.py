"""Backend/platform selection + persistent compile cache.

In some environments a site hook registers an accelerator plugin and
force-overrides ``jax_platforms`` at interpreter start, so the usual
``JAX_PLATFORMS`` env var is ignored. ``apply_platform_from_env()`` restores
user control: set ``F4L_PLATFORM=cpu`` (or any platform string) and call it
before first jax use — every CLI driver and the test conftest do.

It also enables JAX's persistent compilation cache (XLA compiles of the
big fixed-shape pipeline stages take 30-90 s each on remote-compile TPU
harnesses; the cache makes every process after the first start warm). Set
``F4L_COMPILE_CACHE=0`` to disable or point ``F4L_COMPILE_CACHE`` at a
directory (default ``~/.cache/fusion4landslide_tpu/jax``).
"""

from __future__ import annotations

import os

__all__ = ["apply_platform_from_env", "enable_compile_cache"]


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache (survives process restarts)."""
    setting = os.environ.get("F4L_COMPILE_CACHE", "")
    if setting == "0":
        return
    cache_dir = setting or os.path.expanduser(
        "~/.cache/fusion4landslide_tpu/jax"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Source locations ride HLO metadata; keep them out of the cache
        # key so editing unrelated code doesn't invalidate every entry.
        jax.config.update("jax_compilation_cache_include_metadata_in_key", False)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def apply_platform_from_env(default: str | None = None) -> None:
    enable_compile_cache()
    platform = os.environ.get("F4L_PLATFORM", default)
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
