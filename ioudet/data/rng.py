"""Per-sample deterministic RNG for pipeline transforms.

The reference seeds torch DataLoader *worker processes* once
(ref: mmdet/datasets/loader/build_loader.py (worker_init_fn)); our loader
uses threads, where a process-global RNG makes the augmentation stream
depend on thread interleaving — two iterators alive at once (e.g. an
abandoned prefetching iterator racing the training loop) steal draws from
each other and the trained model drifts run to run.

TPU-native fix: the loader seeds one ``random.Random`` per (seed, epoch,
sample index) into a ``threading.local`` around each ``__getitem__`` call;
transforms draw from :func:`sample_rng`.  Augmentations become a pure
function of (seed, epoch, idx) — reproducible across runs, worker counts,
process counts, and abandoned iterators.  Direct pipeline calls outside a
loader fall back to the global ``random`` module, preserving the
reference's seed-the-globals behavior for scripts and tests.
"""

from __future__ import annotations

import random
import threading

_local = threading.local()


def set_sample_rng(rng) -> None:
    _local.rng = rng


def clear_sample_rng() -> None:
    _local.rng = None


def sample_rng():
    """The ambient per-sample RNG, or the global ``random`` module."""
    return getattr(_local, "rng", None) or random


def make_sample_rng(seed: int, epoch: int, idx: int) -> random.Random:
    """Deterministic per-sample stream (SplitMix-style integer mix so
    neighbouring (epoch, idx) pairs land far apart)."""
    x = (seed * 0x9E3779B97F4A7C15 + epoch * 0xBF58476D1CE4E5B9
         + idx * 0x94D049BB133111EB) & (2 ** 64 - 1)
    return random.Random(x)
