"""Logging / distributed helpers.

Equivalent surface to the reference's ``hicom/utils.py``: rank helpers map to
``jax.process_index``/``jax.process_count`` (JAX multi-host) instead of
torch.distributed; the checkpoint-validity scan lives in
``train/checkpoints.py`` (orbax handles atomicity).
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


def get_world_size() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def get_rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def is_main_process() -> bool:
    return get_rank() == 0


def rank0_print(*args, **kwargs):
    if is_main_process():
        print(*args, **kwargs)


def synchronize():
    """Barrier across hosts (no-op single-host)."""
    if get_world_size() == 1:
        return
    import jax
    import jax.numpy as jnp

    # a tiny psum over all processes acts as a barrier
    jax.block_until_ready(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),))
        )
    )


def build_logger(name: str, filename: Optional[str] = None, level=logging.INFO) -> logging.Logger:
    """Console (+ optional daily-rotating file) logger (reference utils.py:103-143)."""
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s | %(levelname)s | %(name)s | %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(fmt)
    logger.addHandler(handler)
    if filename:
        os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
        from logging.handlers import TimedRotatingFileHandler

        fh = TimedRotatingFileHandler(filename, when="D", utc=True)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _LOGGERS[name] = logger
    return logger
