"""Compiled-on-TPU Pallas kernel parity as a pytest tier.

The rest of the suite runs the Pallas kernels in interpret mode on the
virtual CPU platform (tests/conftest.py). This test runs the compiled
Mosaic variants on the real chip by shelling out to
``scripts/tpu_kernel_check.py`` in a fresh process (the conftest pins
this process to CPU, so the check must run out-of-process to see the
TPU). It SKIPS — never trivially passes — when no TPU backend is
attached, so green on CPU CI carries no false signal.

Covers (see the script): blocked-CSR segment sum/max/mean fwd+VJP, the
MXU one-hot table backward, the BN-mix mega-kernel through a full
LPSupernet step, and the static-padded-CSR no-op-chunk hazard that
interpret mode cannot catch (NOTES.md round-2).
"""
from __future__ import annotations

import os
import subprocess
import sys

import pytest

_SCRIPT = os.path.join(
    os.path.dirname(__file__), os.pardir, "scripts", "tpu_kernel_check.py"
)


@pytest.mark.tpu
@pytest.mark.slow
def test_tpu_compiled_kernels():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    # drop the CPU-forcing flag the conftest injects for this process
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    try:
        proc = subprocess.run(
            [sys.executable, _SCRIPT],
            capture_output=True,
            text=True,
            timeout=3600,
            env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip(
            "tpu_kernel_check.py exceeded 3600s — likely a cold XLA "
            "compile through the tunnel (~7 min per large program, "
            "several programs on a fresh cache); rerun with a warm "
            "compilation cache"
        )
    out = proc.stdout + proc.stderr
    if "SKIP: default backend" in out:
        pytest.skip("no TPU backend attached")
    assert proc.returncode == 0, out
    assert "ALL TPU KERNEL CHECKS PASSED" in out, out
