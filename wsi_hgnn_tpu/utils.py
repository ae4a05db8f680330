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


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    First compiles of the CNN featurizers are minutes on TPU (HoVer-Net's
    ResNet50 encoder + giant fc1 especially); the cache makes every rerun
    of a CLI start in seconds. Default location honours
    WSI_HGNN_COMPILE_CACHE, else ~/.cache/wsi_hgnn_tpu/jax. No-op if the
    running jax does not support the config keys."""
    import os

    import jax

    path = path or os.environ.get(
        "WSI_HGNN_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "wsi_hgnn_tpu", "jax"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as e:  # pragma: no cover - old jax or RO filesystem
        logging.debug("compile cache unavailable: %s", e)


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
