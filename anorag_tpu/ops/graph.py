"""Graph compute as array ops: CSR adjacency, PageRank, k-hop expansion.

Replaces the reference's networkx-based graph work — weighted PageRank at
index build (/root/reference/graph/graph_index.py:43-49), per-seed Dijkstra
k-hop retrieval (/root/reference/graph/graph_retriever.py:61-92) — with
static-shape array algorithms:
  * adjacency is CSR on host and a padded (N, max_deg) neighbor table on
    device (gather-friendly, no pointer chasing);
  * PageRank is power iteration over the weighted adjacency (segment-sum);
  * k-hop expansion is iterated neighbor gathers with a visited mask and a
    best-distance relaxation (weighted-shortest-path within cutoff k — the
    Dijkstra-with-cutoff semantics for small k).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(3.0e38)


@dataclass
class CSRGraph:
    """Undirected weighted graph, CSR + padded neighbor table."""

    indptr: np.ndarray       # (N+1,)
    indices: np.ndarray      # (nnz,)
    weights: np.ndarray      # (nnz,) f32
    edge_types: np.ndarray   # (nnz,) i32 (index into type vocabulary)
    n_nodes: int
    # padded device form
    nbr: np.ndarray          # (N, max_deg) i32, -1 pad
    nbr_w: np.ndarray        # (N, max_deg) f32
    nbr_t: np.ndarray        # (N, max_deg) i32

    @property
    def n_edges(self) -> int:
        return len(self.indices) // 2


def build_csr(
    n_nodes: int,
    edges: Sequence[Tuple[int, int, float, int]],
    max_deg: Optional[int] = None,
) -> CSRGraph:
    """edges = (u, v, weight, type_id), undirected (stored both ways)."""
    if len(edges):
        arr = np.asarray([(u, v, w, t) for (u, v, w, t) in edges], dtype=np.float64)
        u = arr[:, 0].astype(np.int64)
        v = arr[:, 1].astype(np.int64)
        w = arr[:, 2].astype(np.float32)
        t = arr[:, 3].astype(np.int32)
        src = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        ww = np.concatenate([w, w])
        tt = np.concatenate([t, t])
    else:
        src = dst = np.zeros(0, np.int64)
        ww = np.zeros(0, np.float32)
        tt = np.zeros(0, np.int32)

    order = np.argsort(src, kind="stable")
    src, dst, ww, tt = src[order], dst[order], ww[order], tt[order]
    indptr = np.zeros(n_nodes + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)

    deg = np.diff(indptr)
    md = int(deg.max()) if n_nodes and len(src) else 1
    if max_deg is not None:
        md = min(md, max_deg)
    md = max(1, md)
    nbr = np.full((n_nodes, md), -1, np.int32)
    nbr_w = np.zeros((n_nodes, md), np.float32)
    nbr_t = np.zeros((n_nodes, md), np.int32)
    for i in range(n_nodes):
        lo, hi = indptr[i], indptr[i + 1]
        # keep strongest edges when truncating to max_deg
        seg = slice(lo, hi)
        ws = ww[seg]
        keep = np.argsort(-ws, kind="stable")[:md]
        k = len(keep)
        nbr[i, :k] = dst[seg][keep]
        nbr_w[i, :k] = ws[keep]
        nbr_t[i, :k] = tt[seg][keep]
    return CSRGraph(indptr, dst.astype(np.int32), ww, tt, n_nodes, nbr, nbr_w, nbr_t)


@functools.partial(jax.jit, static_argnames=("iters",))
def pagerank(
    nbr: jax.Array, nbr_w: jax.Array, alpha: float = 0.85, iters: int = 30
) -> jax.Array:
    """Weighted PageRank by power iteration over the padded neighbor table.

    Matches networkx.pagerank semantics: transition probability out of node i
    along edge (i,j) = w_ij / sum_k w_ik; dangling mass redistributed
    uniformly.
    """
    n, _ = nbr.shape
    valid = nbr >= 0
    w = jnp.where(valid, nbr_w, 0.0)
    out_sum = jnp.sum(w, axis=1, keepdims=True)         # (N, 1)
    p_trans = jnp.where(out_sum > 0, w / jnp.maximum(out_sum, 1e-30), 0.0)
    dangling = (out_sum[:, 0] <= 0)
    safe_nbr = jnp.maximum(nbr, 0)

    def body(_, r):
        contrib = r[:, None] * p_trans                   # (N, max_deg)
        flat = jnp.zeros((n,), jnp.float32).at[safe_nbr.reshape(-1)].add(
            jnp.where(valid, contrib, 0.0).reshape(-1)
        )
        dangling_mass = jnp.sum(jnp.where(dangling, r, 0.0))
        return (1 - alpha) / n + alpha * (flat + dangling_mass / n)

    r0 = jnp.full((n,), 1.0 / n, jnp.float32)
    return jax.lax.fori_loop(0, iters, body, r0)


@functools.partial(jax.jit, static_argnames=("k_hops",))
def k_hop_distances(
    nbr: jax.Array, nbr_w: jax.Array, seed_mask: jax.Array, k_hops: int
) -> Tuple[jax.Array, jax.Array]:
    """Weighted shortest distance from the seed set within k hops.

    Bellman-Ford style relaxation, k rounds: dist (N,) f32 (INF if
    unreachable), hops (N,) i32 = hop count at which first reached (-1 if
    never). Edge length = weight (the reference Dijkstra uses edge weight as
    length with cutoff=k, graph_retriever.py:61-92).
    """
    n, _ = nbr.shape
    valid = nbr >= 0
    safe_nbr = jnp.maximum(nbr, 0)
    dist0 = jnp.where(seed_mask, 0.0, float(INF))
    hops0 = jnp.where(seed_mask, 0, -1)

    def body(h, carry):
        dist, hops = carry
        # candidate distance to each node via incoming edges:
        # for edge (i -> nbr[i,j]): dist[i] + w
        cand = dist[:, None] + jnp.where(valid, nbr_w, float(INF))
        flat_target = safe_nbr.reshape(-1)
        flat_cand = jnp.where(valid, cand, float(INF)).reshape(-1)
        best = jnp.full((n,), float(INF)).at[flat_target].min(flat_cand)
        improved = best < dist
        dist = jnp.where(improved, best, dist)
        hops = jnp.where(improved & (hops < 0), h + 1, hops)
        return dist, hops

    return jax.lax.fori_loop(0, k_hops, body, (dist0, hops0))


def k_hop_scores(
    graph: CSRGraph,
    seeds: Sequence[int],
    centrality: np.ndarray,
    k_hops: int = 2,
    eps: float = 0.1,
) -> np.ndarray:
    """score(node) = centrality / (distance + eps) for reachable nodes, 0
    elsewhere — the k-hop retrieval scoring of GraphRetriever.retrieve."""
    seed_mask = np.zeros(graph.n_nodes, bool)
    seeds = [s for s in seeds if 0 <= s < graph.n_nodes]
    if not seeds:
        return np.zeros(graph.n_nodes, np.float32)
    seed_mask[list(seeds)] = True
    dist, hops = k_hop_distances(
        jnp.asarray(graph.nbr), jnp.asarray(graph.nbr_w), jnp.asarray(seed_mask), k_hops
    )
    dist = np.asarray(dist)
    reach = dist < INF / 2
    return np.where(reach, np.asarray(centrality) / (dist + eps), 0.0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("k_hops",))
def k_hop_frontier(nbr: jax.Array, seed_mask: jax.Array, k_hops: int) -> jax.Array:
    """Boolean reachability within k hops (unweighted) — cheap expansion
    used for candidate pools."""
    valid = nbr >= 0
    safe_nbr = jnp.maximum(nbr, 0)
    n = nbr.shape[0]

    def body(_, mask):
        gathered = mask[safe_nbr] & valid                # (N, max_deg)
        hit_any = jnp.zeros((n,), bool).at[safe_nbr.reshape(-1)].max(
            (mask[:, None] & valid).reshape(-1)
        )
        del gathered
        return mask | hit_any

    return jax.lax.fori_loop(0, k_hops, body, seed_mask)


def connected_components(graph: CSRGraph, max_iters: int = 64) -> np.ndarray:
    """Label propagation components (for graph quality metrics)."""
    labels = jnp.arange(graph.n_nodes, dtype=jnp.int32)
    nbr = jnp.asarray(graph.nbr)
    valid = nbr >= 0
    safe = jnp.maximum(nbr, 0)

    def body(_, lab):
        nbr_lab = jnp.where(valid, lab[safe], jnp.iinfo(jnp.int32).max)
        best = jnp.minimum(lab, jnp.min(nbr_lab, axis=1))
        return best

    labels = jax.lax.fori_loop(0, max_iters, body, labels)
    return np.asarray(labels)


def path_score_components(
    path_weights: np.ndarray,     # (P, L) edge weights along each path, 0 pad
    path_len: np.ndarray,         # (P,)
    endpoint_sim: np.ndarray,     # (P,)
    coverage: np.ndarray,         # (P,)
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.2,
    length_penalty: float = 0.05,
) -> np.ndarray:
    """Vectorized path scoring: alpha*endpoint_sim + beta*avg_edge_weight +
    gamma*coverage - length_penalty*len
    (the GraphAwareRetrieval scoring form, graph/graph_retrieval.py:241)."""
    avg_w = path_weights.sum(axis=1) / np.maximum(path_len, 1)
    return (alpha * endpoint_sim + beta * avg_w + gamma * coverage
            - length_penalty * path_len).astype(np.float32)
