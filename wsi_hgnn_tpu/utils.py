"""Small shared utilities."""
from __future__ import annotations

import logging


def ensure_backend() -> str:
    """Make sure a usable JAX backend exists, falling back to CPU.

    Environments that pin JAX_PLATFORMS to an accelerator plugin raise at
    first use if the device claim fails (e.g. the chip is held by another
    process). Host-side workflows (graph construction, split generation,
    tests) should degrade to CPU instead of dying.
    Returns the platform name in use.
    """
    import jax

    try:
        return jax.devices()[0].platform
    except RuntimeError as e:
        logging.warning("default JAX backend unavailable (%s); falling back to CPU", e)
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()[0].platform


def get_logger():
    """Reference utils.get_logger (/root/reference/utils.py:49-57)."""
    logger = logging.getLogger("main-logger")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        handler = logging.StreamHandler()
        fmt = "[%(asctime)s %(levelname)s %(filename)s line %(lineno)d %(process)d] %(message)s"
        handler.setFormatter(logging.Formatter(fmt))
        logger.addHandler(handler)
    return logger
