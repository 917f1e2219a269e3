"""Asserted from-scratch convergence (VERDICT r1 item 9 / weak item 7).

Promotes scripts/synthetic_convergence.py from an unasserted dev tool to
a seeded regression gate: 1000 supervised iterations from random init on
synthetic overlapping cells must reach AJI(nuclei) >= 0.4 (measured
0.52 on TPU, RESULTS.md). Runs the script in a fresh subprocess so it
uses the real accelerator rather than this process's forced-CPU test
platform; on CPU-only machines the run exceeds the timeout and the test
skips rather than blocking the suite.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_synthetic_convergence_aji_threshold(tmp_path):
    out = str(tmp_path / "conv.json")
    env = dict(os.environ)
    # let the subprocess pick the fastest available platform
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "synthetic_convergence.py"),
             "--iters", "1000", "--out", out],
            cwd=REPO,
            env=env,
            timeout=1800,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("convergence run exceeded 30 min (no accelerator?)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as f:
        data = json.load(f)
    assert data["iters"] == 1000
    # nuclei (class 2) AJI from random init; 0.52 measured on TPU
    assert float(data["AJI"]["2"]) >= 0.4, data
    assert float(data["AP50_all"]) >= 0.5, data
