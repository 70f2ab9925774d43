"""Product quantization: compressed-corpus search for the beyond-HBM regime.

Parity target: /root/reference/vector_store/vector_index.py:77-107 offers
IVFPQ through FAISS. TPU redesign: the asymmetric-distance scan is cast as
a one-hot matmul so it runs on the MXU —

  score(q, doc) = sum_m  LUT[m, codes[doc, m]],   LUT[m, k] = q_m . C[m, k]

is exactly  onehot(codes) (N, M*K)  @  LUT_flat (B, M*K)^T, a single MXU
contraction per corpus chunk (TPU gathers are the slow path; one-hot
contractions are the fast path — same trick XLA itself uses to lower small
gathers). The scan streams chunks through a lax.scan with per-chunk
`approx_max_k`, so peak memory is O(B*chunk) and the codes (M bytes/row,
a 16-32x compression vs the bf16/f32 rows) are the only corpus-sized
device residency. Exact re-ranking of the PQ top-candidates against the
host-resident f32 rows restores recall (IVFPQ-with-refine semantics).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.kmeans import kmeans_fit
from anorag_tpu.ops.topk import NEG_INF
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.pq")


def train_pq(
    emb: np.ndarray,
    m: int,
    n_centroids: int = 256,
    iters: int = 15,
    sample: int = 131072,
    seed: int = 0,
) -> np.ndarray:
    """Per-subspace k-means codebooks (M, K, D/M) f32, trained on a
    subsample (one jit, reused across subspaces — same shapes)."""
    n, d = emb.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    sub = d // m
    rng = np.random.default_rng(seed)
    rows = rng.choice(n, min(n, sample), replace=False) if n > sample else np.arange(n)
    x = np.ascontiguousarray(emb[rows], np.float32).reshape(len(rows), m, sub)
    k = min(n_centroids, len(rows))
    books = []
    for j in range(m):
        c, _ = kmeans_fit(jnp.asarray(x[:, j, :]), k, iters=iters, seed=seed + j)
        books.append(np.asarray(c))
    cb = np.stack(books)                                   # (M, k, sub)
    if k < n_centroids:  # tiny corpora: pad so code dtype/width is stable
        pad = np.repeat(cb[:, :1, :], n_centroids - k, axis=1)
        cb = np.concatenate([cb, pad], axis=1)
    return cb


@functools.partial(jax.jit, static_argnames=())
def _encode_chunk(x: jax.Array, codebooks: jax.Array) -> jax.Array:
    """(Nc, M, sub) -> (Nc, M) int32 nearest-centroid codes (L2)."""
    cross = jnp.einsum("nms,mks->nmk", x, codebooks,
                       preferred_element_type=jnp.float32)
    c_sq = jnp.sum(codebooks * codebooks, axis=-1)          # (M, K)
    return jnp.argmin(c_sq[None] - 2.0 * cross, axis=-1).astype(jnp.int32)


def encode_pq(emb: np.ndarray, codebooks: np.ndarray,
              chunk: int = 65536) -> np.ndarray:
    """(N, D) -> (N, M) uint8 codes, chunked."""
    n, d = emb.shape
    m, k, sub = codebooks.shape
    assert k <= 256, "uint8 codes require K <= 256"
    cb = jnp.asarray(codebooks, jnp.float32)
    out = np.empty((n, m), np.uint8)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        x = jnp.asarray(emb[lo:hi], jnp.float32).reshape(hi - lo, m, sub)
        out[lo:hi] = np.asarray(_encode_chunk(x, cb), np.uint8)
    return out


@functools.partial(jax.jit, static_argnames=())
def pq_lut(queries: jax.Array, codebooks: jax.Array) -> jax.Array:
    """(B, D) x (M, K, sub) -> (B, M, K) inner-product lookup tables."""
    b = queries.shape[0]
    m, k, sub = codebooks.shape
    q = queries.astype(jnp.float32).reshape(b, m, sub)
    return jnp.einsum("bms,mks->bmk", q, codebooks,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx", "recall_target"))
def pq_topk(
    codes: jax.Array,        # (N, M) uint8/int32 device codes
    lut: jax.Array,          # (B, M, K) from pq_lut
    k: int,
    chunk: int = 32768,
    approx: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """ADC top-k over the compressed corpus: per chunk, scores =
    onehot(codes_chunk) @ lut_flat^T on the MXU, then approx_max_k + exact
    cross-chunk merge (structure mirrors ops.topk.dense_topk_xla)."""
    n, m = codes.shape
    b, m2, kc = lut.shape
    k = min(k, n)
    lut_flat = lut.reshape(b, m2 * kc)                      # (B, M*K)
    # the (chunk, M*K) bf16 one-hot operand is materialized by XLA: cap it
    # at ~256MB (a 17GB intermediate at chunk=256k/M=128 crashed the
    # compiler; this is the codebook-ADC tax on TPU — see ops/sq.py for the
    # MXU-native sketch variant that avoids one-hot entirely)
    budget_rows = max(512, (256 << 20) // (m2 * kc * 2) // 512 * 512)
    chunk = min(chunk, budget_rows)
    n_chunks = max(1, -(-n // chunk))
    padded_n = n_chunks * chunk
    codesp = jnp.pad(codes.astype(jnp.int32), ((0, padded_n - n), (0, 0)))

    def body(carry, blk):
        rv, ri = carry
        c_blk = jax.lax.dynamic_slice(codesp, (blk * chunk, 0), (chunk, m))
        onehot = jax.nn.one_hot(c_blk, kc, dtype=jnp.bfloat16)   # (Nc, M, K)
        s = jax.lax.dot_general(
            lut_flat.astype(jnp.bfloat16), onehot.reshape(chunk, m * kc),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # (B, Nc)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        gidx = blk * chunk + col
        s = jnp.where(gidx < n, s, NEG_INF)
        # ApproxTopK fused directly onto the matmul producer crashes the
        # TPU compiler ("no valid iteration window"); the barrier forces
        # the (B, chunk) scores to materialize first.
        s = jax.lax.optimization_barrier(s)
        if approx and jax.default_backend() == "tpu":
            cv, ci = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            cg = blk * chunk + ci
        else:
            cv, ci = jax.lax.top_k(s, k)
            cg = blk * chunk + ci
        mv = jnp.concatenate([rv, cv], axis=1)
        mi = jnp.concatenate([ri, cg], axis=1)
        tv, tp = jax.lax.top_k(mv, k)
        return (tv, jnp.take_along_axis(mi, tp, axis=1)), None

    init = (jnp.full((b, k), NEG_INF), jnp.zeros((b, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return vals, idx


def host_refine(
    vals: np.ndarray, idx: np.ndarray, queries: np.ndarray,
    emb_host: np.ndarray, k: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact f32 re-rank of approximate candidates against host rows —
    the refine step shared by the PQ (codebook) and SQ (sketch) indexes."""
    b, cand = idx.shape
    n = len(emb_host)
    rows = emb_host[np.clip(idx.reshape(-1), 0, n - 1)].reshape(b, cand, -1)
    exact = np.einsum("bcd,bd->bc", rows.astype(np.float32),
                      np.asarray(queries, np.float32))
    exact = np.where(vals > NEG_INF / 2, exact, -np.inf)
    order = np.argsort(-exact, axis=1, kind="stable")[:, :k]
    out_v = np.take_along_axis(exact, order, axis=1)
    out_i = np.take_along_axis(idx, order, axis=1)
    return out_v, out_i


@functools.partial(jax.jit, static_argnames=("k",))
def device_refine(
    vals: jax.Array,      # (B, C) approximate scores (NEG_INF = invalid)
    idx: jax.Array,       # (B, C) candidate doc ids
    queries: jax.Array,   # (B, D) f32
    emb_dev: jax.Array,   # (N, D) device rows (any float dtype)
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Exact re-rank of approximate candidates against DEVICE rows: one
    (B, C, D) gather + einsum, all async-dispatched. Use when the
    full-precision corpus is HBM-resident (the LSH regime) — host refine
    is for the beyond-HBM indexes (PQ/SQ) where no device copy exists,
    and measured 0.5-6 s/batch256 on a single-core host vs ~1 ms here."""
    n = emb_dev.shape[0]
    safe = jnp.clip(idx, 0, n - 1)
    rows = emb_dev[safe]                                     # (B, C, D)
    exact = jnp.einsum("bcd,bd->bc", rows.astype(jnp.float32),
                       queries.astype(jnp.float32))
    exact = jnp.where(vals > NEG_INF / 2, exact, NEG_INF)
    k = min(k, idx.shape[1])
    out_v, order = jax.lax.top_k(exact, k)
    return out_v, jnp.take_along_axis(idx, order, axis=1)


def pq_search(
    codes: jax.Array,
    codebooks: jax.Array,
    queries: np.ndarray,
    k: int,
    emb_host: Optional[np.ndarray] = None,
    candidates: Optional[int] = None,
    chunk: int = 32768,
) -> Tuple[np.ndarray, np.ndarray]:
    """ADC scan for `candidates` per query, then (when `emb_host` is given)
    exact f32 re-rank of those rows on host — the refine step that lifts
    recall@10 back above 0.95. Returns (scores (B,k), ids (B,k))."""
    q = np.atleast_2d(np.asarray(queries, np.float32))
    b = len(q)
    n = codes.shape[0]
    cand = min(candidates or max(4 * k, 64), n)
    lut = pq_lut(jnp.asarray(q), jnp.asarray(codebooks, jnp.float32))
    vals, idx = pq_topk(codes, lut, cand, chunk=chunk)
    vals, idx = np.asarray(vals), np.asarray(idx)
    if emb_host is None:
        k_eff = min(k, cand)
        out_v, out_i = vals[:, :k_eff], idx[:, :k_eff]
    else:
        out_v, out_i = host_refine(vals, idx, q, emb_host, k)
    if out_v.shape[1] < k:
        pad = ((0, 0), (0, k - out_v.shape[1]))
        out_v = np.pad(out_v, pad, constant_values=-np.inf)
        out_i = np.pad(out_i, pad, constant_values=-1)
    return out_v, np.where(np.isfinite(out_v), out_i, -1)
