"""Product-path mesh provisioning.

Gives every user-facing surface (VectorIndex, VectorRetriever,
QueryProcessor, serve.py) one shared device mesh when more than one chip
is attached, so corpus-axis sharded search (SURVEY.md §5.7/5.8) is the
default execution mode on multi-chip hardware — the TPU-native analogue of
the reference scaling its FAISS search across workers
(/root/reference/vector_store/vector_index.py:206-263).

Config surface (config.yaml `tpu:` section):
  tpu.sharded_search: auto|on|off   auto = shard when device_count > 1
  tpu.mesh.model_parallel_size: int  'model' axis width (encoder tp)
"""
from __future__ import annotations

import threading
from typing import Any, Optional

from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.parallel")

_lock = threading.Lock()
_cache: dict = {}


def cfg_get(cfg: Any, dotted: str, default: Any = None) -> Any:
    """Read a dotted key from either a ConfigLoader (dot-path get) or a
    plain nested dict."""
    if cfg is None:
        return default
    get = getattr(cfg, "get", None)
    if get is None:
        return default
    try:
        v = get(dotted, None)
        if v is not None:
            return v
    except Exception:
        pass
    node = cfg
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node if node is not None else default


def product_mesh(cfg: Any = None):
    """The process-wide mesh for sharded product search, or None when
    single-device or disabled.  mode 'on' forces a mesh even with one
    device (useful for exercising the sharded code path in tests)."""
    import jax

    mode = str(cfg_get(cfg, "tpu.sharded_search", "auto")).lower()
    if mode in ("off", "false", "0", "none"):
        return None
    mp = int(cfg_get(cfg, "tpu.mesh.model_parallel_size", 1) or 1)
    n = jax.device_count()
    if n < 2 and mode != "on":
        return None
    key = (n, mp)
    with _lock:
        mesh = _cache.get(key)
        if mesh is None:
            from anorag_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(model_parallel=mp)
            _cache[key] = mesh
            logger.info("product mesh: %s", dict(mesh.shape))
        return mesh


def reset_mesh_cache() -> None:
    with _lock:
        _cache.clear()
