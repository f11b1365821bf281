"""Environment utilities (ref: mmdet/apis/env.py (init_dist, set_random_seed,
get_root_logger) — get_root_logger lives in utils/logging.py).

The reference's ``init_dist`` dispatches over {pytorch, slurm, mpi} launchers
to torch.distributed; the TPU analog is one call to
``jax.distributed.initialize`` (coordinator discovery is automatic on TPU
pods) — re-exported here and from ioudet.parallel.
"""

from __future__ import annotations

import os
import random

import numpy as np

from ..parallel.mesh import init_dist  # noqa: F401  (re-export)


def set_random_seed(seed: int, deterministic: bool = True):
    """Seeds host-side RNGs (python/numpy).  Device-side randomness in JAX is
    explicit (PRNG keys), so unlike the reference there is no global cuDNN
    determinism switch — jitted programs are deterministic by construction.
    Returns a jax PRNGKey for the caller to thread."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))
    import jax
    return jax.random.PRNGKey(seed)


def collect_env() -> dict:
    """Environment fingerprint for logs (ref: tools report CUDA/torch
    versions; we report jax/XLA/devices)."""
    import jax
    import jaxlib

    info = dict(
        jax=jax.__version__,
        jaxlib=jaxlib.__version__,
        backend=jax.default_backend(),
        device_count=jax.device_count(),
        process_count=jax.process_count(),
        devices=[str(d) for d in jax.devices()],
    )
    try:
        import flax
        import optax
        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except ImportError:
        pass
    return info
