"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI, so sharding tests use XLA's
host-platform device-count override (the TPU analog of testing
multi-node without a cluster — see SURVEY.md §4).

Note: the environment pre-imports jax before pytest starts, so
JAX_PLATFORMS set here would be ignored; ``jax.config`` still works as
long as no backend has been initialized, and it also avoids paying the
~60s remote-TPU tunnel connection per test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Reuse compiled executables across test runs: on a small CI host the
# suite's cost is dominated by hundreds of XLA CPU compiles, which are
# identical from run to run.
from mmt_psm_tpu.utils.env import enable_persistent_compilation_cache  # noqa: E402

enable_persistent_compilation_cache()
