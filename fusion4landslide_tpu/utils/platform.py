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

__all__ = [
    "apply_platform_from_env",
    "enable_compile_cache",
    "start_device_keepalive",
]

_KEEPALIVE = {"stop": None}


def start_device_keepalive(interval: float = 20.0):
    """Ping the device from a daemon thread so a tunnelled/remote TPU
    session cannot idle out during minutes-long host-side phases (image
    matching, PLY IO) or background compiles — the failure mode is a
    driver blocked forever in a futex on its next device call. bench.py
    has carried this guard since round 2; this makes it available to the
    CLI drivers. No-op on CPU backends and when called twice. Returns a
    ``threading.Event`` that stops the thread (or None when inactive)."""
    if _KEEPALIVE["stop"] is not None:
        return _KEEPALIVE["stop"]
    try:
        import jax

        if jax.default_backend() == "cpu":
            return None
        import threading

        import jax.numpy as jnp

        stop = threading.Event()

        def loop():
            x = jnp.ones((8,))
            while not stop.is_set():
                try:
                    float(jnp.sum(x))
                except Exception:
                    pass
                stop.wait(interval)

        threading.Thread(target=loop, daemon=True).start()
        _KEEPALIVE["stop"] = stop
        return stop
    except Exception:  # pragma: no cover - best-effort guard
        return None


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
