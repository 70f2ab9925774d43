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
        logger.info("device backend: %s", want)
    except Exception as e:  # pragma: no cover
        logger.warning("device selection failed: %s", e)
