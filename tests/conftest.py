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
    _flags += " --xla_force_host_platform_device_count=8"
# On a low-core host the 8 virtual device threads time-share the CPU and
# reach collectives far apart; XLA's default 40 s rendezvous termination
# then ABORTS the whole process mid-all-reduce (seen as 'Fatal Python
# error: Aborted' at test_parallel under a loaded suite).  These must be
# set before the first backend init — flag parsing happens once.
if "collective_call_terminate" not in _flags:
    _flags += (" --xla_cpu_collective_timeout_seconds=1800"
               " --xla_cpu_collective_call_terminate_timeout_seconds=1800")
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu", jax.default_backend()
