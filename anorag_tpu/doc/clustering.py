"""TopicClustering: note embeddings -> topic pools.

Parity target: /root/reference/doc/clustering.py — cluster note embeddings
(GPU cuML / CPU HDBSCAN/KMeans in the reference) and emit labels + topic
pools with keywords (:238-336). Here clustering is the on-device JAX
k-means (ops.kmeans) with elbow auto-K; density-style behavior is
approximated by dropping low-cohesion assignments to a noise label (-1).
"""
from __future__ import annotations

from collections import Counter, defaultdict
from typing import Any, Dict, List, Sequence

import numpy as np

from anorag_tpu.ops.kmeans import auto_k, kmeans_fit
from anorag_tpu.utils.logging import get_logger
from anorag_tpu.utils.text import tokenize_no_stop

logger = get_logger("anorag.doc")


class TopicClustering:
    def __init__(self, method: str = "kmeans", n_clusters: int = 0,
                 max_clusters: int = 20, iters: int = 15,
                 noise_threshold: float = 0.0, seed: int = 0):
        self.method = method
        self.n_clusters = n_clusters
        self.max_clusters = max_clusters
        self.iters = iters
        self.noise_threshold = noise_threshold
        self.seed = seed

    def cluster_notes(self, notes: Sequence[Dict[str, Any]],
                      embeddings: np.ndarray) -> Dict[str, Any]:
        """Returns {labels, topic_pools, n_clusters} (the clustering.json
        artifact shape)."""
        n = len(notes)
        if n == 0:
            return {"labels": [], "topic_pools": [], "n_clusters": 0}
        if n == 1:
            return {"labels": [0], "topic_pools": self._pools(notes, np.zeros(1, int)),
                    "n_clusters": 1}
        emb = np.asarray(embeddings, np.float32)
        k = self.n_clusters or auto_k(emb, max_k=min(self.max_clusters, n),
                                      iters=max(self.iters // 2, 5), seed=self.seed)
        k = max(1, min(k, n))
        centroids, labels = kmeans_fit(emb, k, iters=self.iters, seed=self.seed)
        labels = np.asarray(labels)
        if self.noise_threshold > 0:
            c = np.asarray(centroids)
            sims = np.einsum("nd,nd->n",
                             emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9),
                             c[labels] / np.maximum(np.linalg.norm(c[labels], axis=1, keepdims=True), 1e-9))
            labels = np.where(sims < self.noise_threshold, -1, labels)
        pools = self._pools(notes, labels)
        logger.info("clustered %d notes into %d topics", n, len(pools))
        return {"labels": labels.tolist(), "topic_pools": pools,
                "n_clusters": int(len(pools))}

    @staticmethod
    def _pools(notes: Sequence[Dict[str, Any]], labels: np.ndarray) -> List[Dict[str, Any]]:
        groups: Dict[int, List[int]] = defaultdict(list)
        for i, l in enumerate(labels):
            if int(l) >= 0:
                groups[int(l)].append(i)
        pools = []
        for label, idxs in sorted(groups.items()):
            token_counts: Counter = Counter()
            for i in idxs:
                token_counts.update(tokenize_no_stop(
                    f"{notes[i].get('title','')} {notes[i].get('content','')}"))
            keywords = [w for w, _ in token_counts.most_common(5)]
            pools.append({
                "topic_id": label,
                "note_ids": [notes[i].get("note_id") for i in idxs],
                "keywords": keywords,
                "description": " / ".join(keywords[:3]),
                "size": len(idxs),
            })
        return pools
