"""TopicClustering: note embeddings -> topic pools.

Parity target: /root/reference/doc/clustering.py — cluster note embeddings
(GPU cuML / CPU HDBSCAN/KMeans/DBSCAN in the reference, :71-170) and emit
labels + topic pools with keywords (:238-336). Methods here:
  * kmeans (default): on-device JAX Lloyd (ops.kmeans) with elbow auto-K;
    optional low-cohesion noise drop;
  * dbscan / hdbscan: TPU-native density clustering — the k-distance
    matrix and eps-neighborhoods are batched matmuls + hardware top-k on
    the MXU (no per-point region queries), auto-eps is the k-distance
    knee (ref :149-170), and clusters are connected components of the
    core-point epsilon graph via ops.graph label propagation; border
    points adopt their nearest core's label, the rest are noise (-1).
"""
from __future__ import annotations

from collections import Counter, defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from anorag_tpu.ops.kmeans import auto_k, kmeans_fit
from anorag_tpu.utils.logging import get_logger
from anorag_tpu.utils.text import tokenize_no_stop

logger = get_logger("anorag.doc")


def _pairwise_sq_dists(emb: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """(N, N) squared L2 via |x|^2 - 2xy + |y|^2 matmuls (chunked rows)."""
    import jax.numpy as jnp

    x = jnp.asarray(emb, jnp.float32)
    sq = jnp.sum(x * x, axis=1)
    out = np.empty((len(emb), len(emb)), np.float32)
    for lo in range(0, len(emb), chunk):
        hi = min(lo + chunk, len(emb))
        cross = jnp.dot(x[lo:hi], x.T, preferred_element_type=jnp.float32)
        d = sq[lo:hi, None] - 2.0 * cross + sq[None, :]
        out[lo:hi] = np.asarray(jnp.maximum(d, 0.0))
    return out


def find_optimal_eps(sq_dists: np.ndarray, min_samples: int) -> float:
    """k-distance knee (ref :149-170): sort every point's distance to its
    min_samples-th neighbour, eps = the largest jump, clamped to a sane
    band."""
    import jax
    import jax.numpy as jnp

    k = min(min_samples + 1, sq_dists.shape[1])  # +1: self at distance 0
    neg_topk, _ = jax.lax.top_k(-jnp.asarray(sq_dists), k)
    k_d = np.sqrt(np.maximum(np.asarray(-neg_topk[:, -1]), 0.0))
    k_d = np.sort(k_d)
    if len(k_d) < 3:
        return float(max(k_d[-1], 0.1)) if len(k_d) else 0.5
    diffs = np.diff(k_d)
    knee = int(np.argmax(diffs))
    return float(max(0.05, min(2.0, k_d[knee])))


def density_cluster(
    emb: np.ndarray,
    min_samples: int = 3,
    eps: Optional[float] = None,
    max_neighbors: int = 64,
) -> Tuple[np.ndarray, float]:
    """DBSCAN labels (noise = -1) for unit-scale embeddings.

    Core test + neighbor lists come from one batched distance computation
    (MXU) instead of per-point region queries; core-core components run
    through the CSR label-propagation primitive. Returns (labels, eps)."""
    from anorag_tpu.ops.graph import build_csr, connected_components

    n = len(emb)
    if n == 0:
        return np.zeros(0, np.int64), 0.0
    sq = _pairwise_sq_dists(np.asarray(emb, np.float32))
    if eps is None:
        eps = find_optimal_eps(sq, min_samples)
    within = sq <= eps * eps
    counts = within.sum(axis=1)                    # includes self
    core = counts >= (min_samples + 1)

    # epsilon graph over core points (degree capped: nearest max_neighbors)
    edges = []
    core_idx = np.where(core)[0]
    core_set = set(core_idx.tolist())
    for i in core_idx:
        nbrs = np.where(within[i])[0]
        if len(nbrs) > max_neighbors:
            order = np.argsort(sq[i][nbrs])[:max_neighbors]
            nbrs = nbrs[order]
        for j in nbrs:
            if j > i and j in core_set:
                edges.append((int(i), int(j), 1.0, 0))
    comp = connected_components(build_csr(n, edges))

    labels = np.full(n, -1, np.int64)
    if len(core_idx):
        # densify component ids over cores to 0..C-1
        uniq = {c: li for li, c in enumerate(sorted(set(int(comp[i]) for i in core_idx)))}
        for i in core_idx:
            labels[i] = uniq[int(comp[i])]
        # border points: adopt the nearest core within eps
        for i in np.where(~core)[0]:
            cands = core_idx[within[i][core_idx]]
            if len(cands):
                labels[i] = labels[cands[np.argmin(sq[i][cands])]]
    return labels, float(eps)


class TopicClustering:
    def __init__(self, method: str = "kmeans", n_clusters: int = 0,
                 max_clusters: int = 20, iters: int = 15,
                 noise_threshold: float = 0.0, seed: int = 0,
                 min_samples: int = 3, eps: Optional[float] = None):
        self.method = method
        self.n_clusters = n_clusters
        self.max_clusters = max_clusters
        self.iters = iters
        self.noise_threshold = noise_threshold
        self.seed = seed
        self.min_samples = min_samples
        self.eps = eps

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
        if self.method.lower() in ("dbscan", "hdbscan", "density"):
            labels, eps = density_cluster(emb, min_samples=self.min_samples,
                                          eps=self.eps)
            pools = self._pools(notes, labels)
            logger.info("density-clustered %d notes into %d topics "
                        "(eps=%.3f, %d noise)", n, len(pools), eps,
                        int((labels < 0).sum()))
            return {"labels": labels.tolist(), "topic_pools": pools,
                    "n_clusters": int(len(pools)), "eps": eps}
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
