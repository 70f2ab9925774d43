"""Batched Lloyd k-means on device.

Replaces the IVF training path of FAISS IVFFlat
(/root/reference/vector_store/vector_index.py:95-155) and the GPU
clustering path of TopicClustering (/root/reference/doc/clustering.py:48-108)
with jit-compiled Lloyd iterations: assignment is one (N x K) matmul on the
MXU, the update is a segment-sum — both batched and static-shaped.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _kmeans_fit_np(x: np.ndarray, n_clusters: int, iters: int,
                   seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy Lloyd — the small-corpus CPU path. Same algorithm as the jit
    version (farthest-point init, empty clusters keep their centroid) but
    ZERO compiled shapes: per-document KBs (MuSiQue: a fresh ~100-note
    corpus per item, each a new (n, k) pair) were compiling 20+ XLA CPU
    executables per item through auto_k and exhausting vm.max_map_count
    after ~50 items (LLVM 'Cannot allocate memory')."""
    x = np.asarray(x, np.float32)
    n, d = x.shape
    rng = np.random.default_rng(seed)
    s = min(n, max(8 * n_clusters, 4096))
    xs = x[rng.integers(0, n, s)] if s < n else x
    first = int(rng.integers(0, len(xs)))
    centroids = np.zeros((n_clusters, d), np.float32)
    centroids[0] = xs[first]
    min_d = np.sum((xs - xs[first]) ** 2, axis=1)
    for j in range(1, n_clusters):
        nxt = int(np.argmax(min_d))
        centroids[j] = xs[nxt]
        min_d = np.minimum(min_d, np.sum((xs - xs[nxt]) ** 2, axis=1))
    x_sq = np.sum(x * x, axis=1, keepdims=True)

    def assign(c):
        dist = x_sq - 2.0 * (x @ c.T) + np.sum(c * c, axis=1)[None, :]
        return np.argmin(dist, axis=1).astype(np.int32)

    for _ in range(iters):
        a = assign(centroids)
        for j in range(n_clusters):
            members = x[a == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids, assign(centroids)


_NP_SMALL_N = 4096


def kmeans_fit(x, n_clusters: int, iters: int = 15, seed: int = 0):
    """Lloyd k-means: jit/MXU path for real corpora, numpy for tiny ones
    on CPU (avoids one fresh XLA compile per unique (n, k) shape)."""
    n = np.asarray(x).shape[0] if not hasattr(x, "shape") else x.shape[0]
    if n <= _NP_SMALL_N and jax.default_backend() == "cpu":
        return _kmeans_fit_np(np.asarray(x), n_clusters, iters, seed)
    return _kmeans_fit_jit(jnp.asarray(x), n_clusters, iters=iters, seed=seed)


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def _kmeans_fit_jit(
    x: jax.Array,
    n_clusters: int,
    iters: int = 15,
    seed: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd k-means. Returns (centroids (K, D) f32, assignments (N,) i32).

    Init = random distinct-ish data points (deterministic by seed). Empty
    clusters keep their previous centroid.
    """
    x = x.astype(jnp.float32)
    n, d = x.shape
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # (N, 1)

    # Farthest-point init (greedy k-center): robust against the collapsed
    # clusters random init produces on well-separated data. The K sequential
    # distance passes are run over a SUBSAMPLE — on the full matrix they
    # dominate build time (K=1024 over 1M x 1024 is ~8TB of HBM traffic,
    # measured ~11 min; the Lloyd iterations themselves are fast matmuls).
    key = jax.random.PRNGKey(seed)
    s = min(n, max(8 * n_clusters, 4096))
    if s < n:
        rows = jax.random.randint(key, (s,), 0, n)
        xs = x[rows]
    else:
        xs = x
    first = jax.random.randint(jax.random.fold_in(key, 1), (), 0, s)
    init = jnp.zeros((n_clusters, d), jnp.float32).at[0].set(xs[first])
    min_d = jnp.sum((xs - xs[first][None, :]) ** 2, axis=1)

    def init_body(j, carry):
        cents, mind = carry
        nxt = jnp.argmax(mind)
        cents = cents.at[j].set(xs[nxt])
        mind = jnp.minimum(mind, jnp.sum((xs - xs[nxt][None, :]) ** 2, axis=1))
        return cents, mind

    centroids, _ = jax.lax.fori_loop(1, n_clusters, init_body, (init, min_d))

    def assign(c):
        # squared L2 via matmul: |x|^2 - 2 x.c + |c|^2
        cross = jnp.dot(x, c.T, preferred_element_type=jnp.float32)
        c_sq = jnp.sum(c * c, axis=1)[None, :]
        return jnp.argmin(x_sq - 2.0 * cross + c_sq, axis=1).astype(jnp.int32)

    def body(_, c):
        a = assign(c)
        sums = jax.ops.segment_sum(x, a, num_segments=n_clusters)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), a, num_segments=n_clusters)
        new_c = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new_c, c)

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    return centroids, assign(centroids)


def kmeans_inertia(x, centroids, assignments) -> float:
    # numpy: a host reduction — not worth one compiled shape per (n, k)
    x = np.asarray(x, np.float32)
    diff = x - np.asarray(centroids)[np.asarray(assignments)]
    return float(np.sum(diff * diff))


def auto_k(x: np.ndarray, max_k: int = 20, iters: int = 10, seed: int = 0) -> int:
    """Elbow-style auto-K (the reference's CPU clustering auto-K,
    /root/reference/doc/clustering.py:71-170): pick the K where marginal
    inertia reduction drops below 15% of the first drop."""
    n = x.shape[0]
    max_k = max(2, min(max_k, n))
    xs = np.asarray(x)  # numpy in, numpy small-n path out
    inertias = []
    ks = list(range(1, max_k + 1))
    for k in ks:
        c, a = kmeans_fit(xs, k, iters=iters, seed=seed)
        inertias.append(kmeans_inertia(xs, c, a))
    drops = [inertias[i - 1] - inertias[i] for i in range(1, len(inertias))]
    if not drops or drops[0] <= 0:
        return min(2, n)
    for i, d in enumerate(drops):
        if d < 0.15 * drops[0]:
            return ks[i]  # K before this drop
    return ks[-1]
