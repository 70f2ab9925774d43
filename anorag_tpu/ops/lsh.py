"""Sign-sketch LSH — random-hyperplane hashing as an MXU scan.

Parity target: FAISS `IndexLSH` behind the reference's `index_type: LSH`
(ref vector_store/vector_index.py:77-107). Classic LSH packs sign bits
into words and ranks by Hamming distance via popcount — a scalar bit op
TPUs have no fast path for. This module keeps the same geometry (random
rotation + sign quantization; Goemans-Williamson: E[agreement] is a
monotone function of the angle) but stores each bit as a ±1 int8 so the
Hamming ranking becomes an int8 x int8 -> int32 MXU matmul:

    dot(c_q, c_d) = n_bits - 2 * hamming(c_q, c_d)

i.e. the matmul IS the (negated, affine) Hamming distance, computed at
native MXU int8 throughput. Memory: n_bits bytes/row (4x smaller than
f32 at n_bits = D, 8x at D/2). An exact f32 re-rank of the top
candidates on host rows (ops/pq.py::host_refine) restores recall@k —
the same scan+refine contract as ops/sq.py.

vs ops/sq.py (rotated int8): the sketch here is 1 bit per projected
dimension instead of 8, so at equal memory LSH keeps 8x more directions
but 1/256 the per-direction precision. Measured (tests/test_lsh.py +
scripts/bench_pq.py) the int8 sketch dominates at equal bytes on
clustered data; LSH exists for FAISS-parity and for the binary-sketch
regime (cheap incremental encode: one matmul + sign, no training scan).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.pq import host_refine
from anorag_tpu.ops.sq import sq_topk
from anorag_tpu.ops.topk import NEG_INF


def train_lsh(dim: int, n_bits: int, seed: int = 0) -> np.ndarray:
    """(D, n_bits) random hyperplanes, orthonormal in blocks of <= D.

    Orthonormal blocks (QR of Gaussian draws) de-correlate the bits —
    i.i.d. Gaussian planes waste bits on near-duplicate directions.
    """
    rng = np.random.default_rng(seed)
    blocks = []
    remaining = n_bits
    while remaining > 0:
        w = min(remaining, dim)
        g = rng.standard_normal((dim, w)).astype(np.float32)
        q, _ = np.linalg.qr(g)
        blocks.append(q[:, :w].astype(np.float32))
        remaining -= w
    return np.ascontiguousarray(np.concatenate(blocks, axis=1))


def encode_lsh(emb: np.ndarray, planes: np.ndarray,
               chunk: int = 131072) -> np.ndarray:
    """(N, D) f32 -> (N, n_bits) int8 in {-1, +1}, chunked device encode."""
    n = len(emb)
    planes_dev = jnp.asarray(planes)
    codes = np.empty((n, planes.shape[1]), np.int8)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        proj = jnp.dot(jnp.asarray(emb[lo:hi], jnp.float32), planes_dev,
                       preferred_element_type=jnp.float32)
        codes[lo:hi] = np.asarray(jnp.where(proj >= 0, 1, -1).astype(jnp.int8))
    return codes


def lsh_search(
    codes: jax.Array,            # (N, n_bits) int8 in {-1, +1}
    planes: np.ndarray,          # (D, n_bits)
    queries: np.ndarray,         # (B, D) f32
    k: int,
    emb_host: Optional[np.ndarray] = None,
    emb_dev=None,                # (N, D) device rows: on-device exact refine
    candidates: Optional[int] = None,
    chunk: int = 262144,
) -> Tuple[np.ndarray, np.ndarray]:
    """Hamming scan (as ±1 matmul) for `candidates`, exact refine to k.

    Reuses the chunked int8 scan kernel (ops/sq.py::sq_topk) with unit
    scales: for ±1 codes the int32 dot is an affine function of Hamming
    distance, so its top-k IS the Hamming top-k. Refine runs on device
    (ops/pq.py::device_refine, one gather+einsum) when `emb_dev` is given
    — host refine measured 0.5-6 s/batch256 on a 1-core host — and falls
    back to host rows otherwise.
    """
    q = np.atleast_2d(np.asarray(queries, np.float32))
    n, n_bits = codes.shape
    cand = min(candidates or max(4 * k, 64), n)
    # pass planes as a jax.Array to keep them device-resident across calls
    # (re-uploading the (D, n_bits) matrix through a tunneled chip costs
    # more than the whole scan)
    proj = jnp.dot(jnp.asarray(q), jnp.asarray(planes),
                   preferred_element_type=jnp.float32)
    q_codes = jnp.where(proj >= 0, 1, -1).astype(jnp.int8)
    ones_n = jnp.ones((n,), jnp.float32)
    ones_b = jnp.ones((len(q),), jnp.float32)
    vals, idx = sq_topk(codes, ones_n, q_codes, ones_b, cand, chunk=chunk)
    if emb_dev is not None:
        from anorag_tpu.ops.pq import device_refine

        out_v, out_i = device_refine(vals, idx, jnp.asarray(q), emb_dev, k)
        out_v, out_i = np.asarray(out_v), np.asarray(out_i)
        out_i = np.where(out_v > float(NEG_INF) / 2, out_i, -1)
        out_v = np.where(out_i >= 0, out_v, -np.inf)
    elif emb_host is None:
        vals, idx = np.asarray(vals), np.asarray(idx)
        k_eff = min(k, cand)
        # report agreement fraction in [-1, 1] (cos of the angle estimate)
        out_v, out_i = vals[:, :k_eff] / float(n_bits), idx[:, :k_eff]
    else:
        vals, idx = np.asarray(vals), np.asarray(idx)
        out_v, out_i = host_refine(vals, idx, q, emb_host, k)
    if out_v.shape[1] < k:
        pad = ((0, 0), (0, k - out_v.shape[1]))
        out_v = np.pad(out_v, pad, constant_values=-np.inf)
        out_i = np.pad(out_i, pad, constant_values=-1)
    return out_v, np.where(np.isfinite(out_v), out_i, -1)
