"""Process-aware root logger (ref capability: mmdet/apis/env.py (get_root_logger)).

Rank-0 logs at the requested level; other JAX processes are raised to ERROR so
multi-host runs don't interleave output.
"""

from __future__ import annotations

import logging

_initialized = False


def get_root_logger(log_level: int = logging.INFO, log_file: str | None = None) -> logging.Logger:
    global _initialized
    logger = logging.getLogger("ioudet")
    if not _initialized:
        fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
        try:
            import jax
            rank = jax.process_index()
        except Exception:
            rank = 0
        logger.setLevel(log_level if rank == 0 else logging.ERROR)
        logger.propagate = False
        _initialized = True
    return logger
