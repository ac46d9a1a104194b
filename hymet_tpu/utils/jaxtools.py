"""JAX runtime helpers."""

from __future__ import annotations

import os


def apply_platform_override() -> None:
    """Honor HYMET_PLATFORM (cpu|tpu|...) via jax.config — needed because
    some PJRT plugins ignore the JAX_PLATFORMS env var."""
    platform = os.environ.get("HYMET_PLATFORM")
    if not platform:
        return
    import jax

    try:
        jax.config.update("jax_platforms", platform)
    except Exception:  # noqa: BLE001
        pass


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent compiled-executable cache (saves tens of
    seconds of XLA compilation per fresh process; set
    HYMET_NO_COMPILE_CACHE=1 to disable)."""
    if os.environ.get("HYMET_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "HYMET_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "hymet_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
