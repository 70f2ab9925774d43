"""HybridSearcher: configured fusion of dense/bm25/graph/path score lists.

Parity target: /root/reference/retrieval/hybrid_search.py:13-115. The math
lives in anorag_tpu.ops.fusion (vectorized); this class reads
`retrieval.hybrid` config (fusion_method, weights, rrf_k, candidate_pool)
and exposes the same `fuse(dense, bm25, graph, path)` API over
(note_id, score) lists.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from anorag_tpu.ops.fusion import fuse_candidate_table


class HybridSearcher:
    def __init__(self, cfg: Any):
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        r_cfg = get("retrieval", {}) or {}
        h_cfg = r_cfg.get("hybrid", {}) if isinstance(r_cfg, dict) else {}
        self.candidate_pool = (r_cfg or {}).get("candidate_pool", 50)
        self.enabled = h_cfg.get("enabled", True)
        self.fusion_method = h_cfg.get("fusion_method", "linear")
        self.weights = h_cfg.get("weights", {"dense": 1.0, "bm25": 0.5, "graph": 0.5, "path": 0.1})
        self.rrf_k = h_cfg.get("rrf_k", 60)

    def fuse(
        self,
        dense: Optional[List[Tuple[str, float]]] = None,
        bm25: Optional[List[Tuple[str, float]]] = None,
        graph: Optional[List[Tuple[str, float]]] = None,
        path: Optional[List[Tuple[str, float]]] = None,
    ) -> List[Dict[str, Any]]:
        if not self.enabled:
            return []
        sources = {
            "dense": dict(dense or []),
            "bm25": dict(bm25 or []),
            "graph": dict(graph or []),
            "path": dict(path or []),
        }
        return fuse_candidate_table(
            sources,
            method=self.fusion_method,
            weights=self.weights,
            rrf_k=self.rrf_k,
            candidate_pool=self.candidate_pool,
        )


def create_hybrid_searcher(cfg: Any) -> HybridSearcher:
    return HybridSearcher(cfg)
