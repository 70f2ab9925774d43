"""BatchProcessor: adaptive batching with device-memory monitoring.

Parity target: /root/reference/utils/batch_processor.py (CUDA memory polling
:20-42) — on TPU, memory stats come from jax device memory_stats(); batch
size halves on OOM-looking failures and recovers gradually.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, TypeVar

from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.batch")

T = TypeVar("T")
R = TypeVar("R")


def device_memory_stats() -> Dict[str, Any]:
    """Per-device memory stats when the backend exposes them."""
    try:
        import jax

        out = {}
        for d in jax.local_devices():
            stats = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        return out
    except Exception:
        return {}


class BatchProcessor:
    def __init__(self, batch_size: int = 64, min_batch_size: int = 1,
                 grow_after: int = 4):
        self.batch_size = batch_size
        self.initial_batch_size = batch_size
        self.min_batch_size = min_batch_size
        self.grow_after = grow_after
        self._ok_streak = 0

    def process(self, items: Sequence[T],
                fn: Callable[[List[T]], List[R]]) -> List[R]:
        """Apply fn to batches; halve the batch size on resource errors."""
        out: List[R] = []
        i = 0
        while i < len(items):
            bs = self.batch_size
            batch = list(items[i : i + bs])
            try:
                out.extend(fn(batch))
                i += len(batch)
                self._ok_streak += 1
                if (self._ok_streak >= self.grow_after
                        and self.batch_size < self.initial_batch_size):
                    self.batch_size = min(self.batch_size * 2, self.initial_batch_size)
                    self._ok_streak = 0
            except (MemoryError, RuntimeError) as e:
                if self.batch_size <= self.min_batch_size:
                    raise
                self.batch_size = max(self.min_batch_size, self.batch_size // 2)
                self._ok_streak = 0
                logger.warning("batch failed (%s); retrying at batch_size=%d",
                               type(e).__name__, self.batch_size)
        return out
