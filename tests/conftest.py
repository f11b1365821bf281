"""Test harness: run the suite on a virtual 8-device CPU mesh.

The environment's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU relay, so plain env vars are too late — but the backend itself
initializes lazily, so flipping ``jax_platforms`` via jax.config before the
first device query reliably lands on CPU.  XLA_FLAGS must be set before the
CPU client is created for the 8-device mesh used by the sharding tests.
(The real TPU is exercised by bench.py and the driver's graft entry.)
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu", jax.default_backend()
