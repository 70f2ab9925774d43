"""Rotated int8 sketch search — the MXU-native compressed-corpus scan.

The TPU answer to FAISS IVFPQ (ref vector_store/vector_index.py:77-107) in
the beyond-HBM regime. Codebook ADC is a table-GATHER per (doc, subspace)
— the one operation TPUs lack hardware for (ops/pq.py pays for it with a
materialized one-hot contraction, 16-32x the flat FLOPs). This module uses
the structure TPUs reward instead:

  1. rotate: project rows onto the top-r principal directions (uncentered
     PCA — inner products are what we search, so no centering);
  2. quantize: per-row symmetric int8 (scale = max|row|/127);
  3. scan: int8 x int8 -> int32 matmul — the MXU runs this natively at
     ~4x bf16 throughput, and with r < D the scan does FEWER flops than
     flat search while touching r bytes/row of HBM (16x less than bf16
     rows at r = D/8);
  4. refine: exact f32 re-rank of the top candidates on host rows
     (ops/pq.py::host_refine) restores recall@k.

Same compression as PQ with M = r subspace-bytes, strictly better speed
on this hardware; both are exposed through VectorIndex(index_type=IVFPQ)
via tpu.pq.impl = sketch (default) | codebook.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.pq import host_refine
from anorag_tpu.ops.topk import NEG_INF
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.sq")


def train_sq(emb: np.ndarray, r: int, sample: int = 131072,
             seed: int = 0) -> np.ndarray:
    """Rotation matrix (D, r): top-r eigenvectors of the (uncentered)
    second-moment matrix, estimated on a subsample."""
    n, d = emb.shape
    r = min(r, d)
    rng = np.random.default_rng(seed)
    rows = rng.choice(n, min(n, sample), replace=False) if n > sample else np.arange(n)
    x = np.asarray(emb[rows], np.float32)
    cov = (x.T @ x) / len(x)                              # (D, D)
    w, v = np.linalg.eigh(cov)                            # ascending
    return np.ascontiguousarray(v[:, ::-1][:, :r], np.float32)


@functools.partial(jax.jit, static_argnames=())
def _quantize_rows(proj: jax.Array) -> Tuple[jax.Array, jax.Array]:
    scale = jnp.max(jnp.abs(proj), axis=1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(proj / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def encode_sq(emb: np.ndarray, rotation: np.ndarray,
              chunk: int = 131072) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) -> (codes (N, r) int8, scales (N,) f32), chunked."""
    n = len(emb)
    r = rotation.shape[1]
    rot = jnp.asarray(rotation)
    codes = np.empty((n, r), np.int8)
    scales = np.empty((n,), np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        proj = jnp.dot(jnp.asarray(emb[lo:hi], jnp.float32), rot,
                       preferred_element_type=jnp.float32)
        q, s = _quantize_rows(proj)
        codes[lo:hi] = np.asarray(q)
        scales[lo:hi] = np.asarray(s)
    return codes, scales


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx", "recall_target"))
def sq_topk(
    codes: jax.Array,        # (N, r) int8
    scales: jax.Array,       # (N,) f32
    q_codes: jax.Array,      # (B, r) int8
    q_scales: jax.Array,     # (B,) f32
    k: int,
    chunk: int = 262144,
    approx: bool = True,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """int8 MXU scan + chunked approx top-k merge, O(B*chunk) memory."""
    n, r = codes.shape
    b = q_codes.shape[0]
    k = min(k, n)
    n_chunks = max(1, -(-n // chunk))
    padded_n = n_chunks * chunk
    codesp = jnp.pad(codes, ((0, padded_n - n), (0, 0)))
    scalesp = jnp.pad(scales, (0, padded_n - n))

    def body(carry, blk):
        rv, ri = carry
        c_blk = jax.lax.dynamic_slice(codesp, (blk * chunk, 0), (chunk, r))
        s_blk = jax.lax.dynamic_slice(scalesp, (blk * chunk,), (chunk,))
        s32 = jax.lax.dot_general(
            q_codes, c_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                                  # (B, chunk) i32
        s = s32.astype(jnp.float32) * s_blk[None, :] * q_scales[:, None]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        gidx = blk * chunk + col
        s = jnp.where(gidx < n, s, NEG_INF)
        # see ops/pq.py: ApproxTopK fused onto a matmul producer crashes
        # the TPU compiler; barrier forces score materialization
        s = jax.lax.optimization_barrier(s)
        if approx and jax.default_backend() == "tpu":
            cv, ci = jax.lax.approx_max_k(s, k, recall_target=recall_target)
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


def sq_quantize_queries(queries: np.ndarray, rotation: np.ndarray):
    proj = jnp.dot(jnp.asarray(np.atleast_2d(queries), jnp.float32),
                   jnp.asarray(rotation), preferred_element_type=jnp.float32)
    return _quantize_rows(proj)


def sq_search(
    codes: jax.Array,
    scales: jax.Array,
    rotation: np.ndarray,
    queries: np.ndarray,
    k: int,
    emb_host: Optional[np.ndarray] = None,
    candidates: Optional[int] = None,
    chunk: int = 262144,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sketch scan for `candidates`, then exact host refine to top-k."""
    q = np.atleast_2d(np.asarray(queries, np.float32))
    n = codes.shape[0]
    cand = min(candidates or max(4 * k, 64), n)
    qc, qs = sq_quantize_queries(q, rotation)
    vals, idx = sq_topk(codes, scales, qc, qs, cand, chunk=chunk)
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
