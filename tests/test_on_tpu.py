"""Env-gated ON-TPU exactness suite (VERDICT r4 next #6).

The regular suite pins jax to CPU (tests/conftest.py), so every Pallas
kernel runs in interpret mode there; the Mosaic lowering itself is asserted
by tools/verify_on_tpu.py, which this test runs in a SUBPROCESS (a fresh
process lands on the real TPU relay — the conftest platform pin is
per-process).  Gate: IOUDET_TPU_TESTS=1, set only where a chip is attached;
CI stays green without one.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "..", "tools", "verify_on_tpu.py")


@pytest.mark.skipif(os.environ.get("IOUDET_TPU_TESTS") != "1",
                    reason="set IOUDET_TPU_TESTS=1 on a machine with a TPU")
def test_pallas_exactness_compiled_on_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # land on the default (TPU) backend
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, TOOL], env=env,
                         capture_output=True, text=True, timeout=1500)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    lines = [json.loads(l) for l in out.stdout.splitlines()
             if l.startswith("{")]
    assert lines[-1].get("ok") is True
    checks = {l.get("check") for l in lines if "check" in l}
    assert checks == {"assign_pallas", "nms_pallas", "focal_pallas"}
