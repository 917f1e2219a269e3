"""Environment diagnostics (reference: utils/collect_env.py, utils/env.py)."""

from __future__ import annotations

import os
import platform
import sys


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache.

    XLA compiles each jitted program once per process; on this repo's
    graphs a cold compile of the flagship model costs 20-40s (and the
    CPU test suite recompiles hundreds of programs per run). The
    persistent cache makes every re-run of an unchanged program a disk
    hit instead. Safe to call multiple times; returns the cache dir or
    None if the backend rejects the config (older jax).
    """
    cache_dir = cache_dir or os.environ.get(
        "MMT_PSM_COMPILATION_CACHE", os.path.expanduser("~/.cache/mmt_psm_jax_cache")
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, not just slow compiles: the test suite's cost
        # is hundreds of small programs, each individually "fast"
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:
        return None


def collect_env_info() -> str:
    lines = [
        f"python: {sys.version.split()[0]} ({platform.platform()})",
    ]
    try:
        import jax

        lines.append(f"jax: {jax.__version__}")
        try:
            lines.append(f"devices: {[str(d) for d in jax.devices()]}")
        except Exception as e:  # backend may be unavailable
            lines.append(f"devices: <unavailable: {e}>")
    except ImportError:
        lines.append("jax: not installed")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            m = __import__(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except ImportError:
            lines.append(f"{mod}: not installed")
    return "\n".join(lines)
