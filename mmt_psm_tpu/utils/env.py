"""Environment diagnostics (reference: utils/collect_env.py, utils/env.py)."""

from __future__ import annotations

import platform
import sys


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
