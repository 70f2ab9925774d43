"""Device selection honoring `system.device`.

The reference exposes `system.device` (cpu/cuda); here it selects the JAX
platform. Must run before any JAX computation — the env var alone is
overridden by site plugins (e.g. the axon TPU plugin), so jax.config is used.
"""
from __future__ import annotations

from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.device")


def apply_device_config(cfg) -> None:
    want = str(cfg.get("system.device", "tpu") or "tpu").lower()
    if want in ("cuda", "gpu"):
        want = "tpu"  # reference configs say cuda; our accelerator is the TPU
    if want not in ("cpu", "tpu"):
        return
    try:
        import jax

        if want == "cpu":
            jax.config.update("jax_platforms", "cpu")
        _enable_compilation_cache(cfg)
        logger.info("device backend: %s", want)
    except Exception as e:  # pragma: no cover
        logger.warning("device selection failed: %s", e)


def _enable_compilation_cache(cfg) -> None:
    """Persistent XLA compilation cache: fresh CLI processes skip the
    20-120s tunnel compiles for shapes they have seen before."""
    import os

    import jax

    cache_dir = cfg.get("tpu.compilation_cache_dir",
                        os.path.expanduser("~/.cache/anorag_jax"))
    if not cache_dir:
        return
    cache_dir = os.path.expanduser(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("compilation cache: %s", cache_dir)
    except Exception as e:  # pragma: no cover
        logger.info("compilation cache unavailable: %s", e)
