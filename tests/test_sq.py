"""Rotated int8 sketch index (ops/sq.py): quantization exactness bounds,
scan-vs-oracle parity, refine recall, and k-padding (the MXU-native IVFPQ
engine; ref vector_store/vector_index.py:77-107)."""
import numpy as np

import jax.numpy as jnp

from anorag_tpu.ops.sq import (
    encode_sq,
    sq_quantize_queries,
    sq_search,
    sq_topk,
    train_sq,
)
from anorag_tpu.ops.topk import dense_topk_np


def _clustered(rng, n=1200, d=64, centers=30):
    c = rng.standard_normal((centers, d)).astype(np.float32) * 2.0
    rows = c[rng.integers(0, centers, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows.astype(np.float32)


def test_rotation_is_orthonormal(rng):
    emb = _clustered(rng)
    rot = train_sq(emb, r=16)
    assert rot.shape == (64, 16)
    np.testing.assert_allclose(rot.T @ rot, np.eye(16), atol=1e-4)


def test_encode_roundtrip_error_bounded(rng):
    emb = _clustered(rng, n=500)
    rot = train_sq(emb, r=64)  # full rank: error is int8 rounding only
    codes, scales = encode_sq(emb, rot)
    assert codes.dtype == np.int8 and codes.shape == (500, 64)
    recon = (codes.astype(np.float32) * scales[:, None]) @ rot.T
    err = np.linalg.norm(recon - emb, axis=1)
    assert err.max() < 0.05  # ~1/127 per-dim rounding on unit rows


def test_scan_matches_int_oracle(rng):
    emb = _clustered(rng, n=700)
    q = emb[:5]
    rot = train_sq(emb, r=32)
    codes, scales = encode_sq(emb, rot)
    qc, qs = sq_quantize_queries(q, rot)
    vals, idx = sq_topk(jnp.asarray(codes), jnp.asarray(scales), qc, qs,
                        10, chunk=256)
    vals, idx = np.asarray(vals), np.asarray(idx)
    oracle = (np.asarray(qc, np.int32) @ codes.astype(np.int32).T)
    oracle = oracle.astype(np.float32) * scales[None, :] * np.asarray(qs)[:, None]
    for b in range(5):
        want = np.sort(oracle[b])[::-1][:10]
        np.testing.assert_allclose(np.sort(vals[b])[::-1], want, rtol=1e-5)


def test_refine_recall_and_self_hit(rng):
    emb = _clustered(rng, n=2000)
    q = emb[rng.integers(0, 2000, 16)] + 0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    rot = train_sq(emb, r=8)  # aggressive 16x compression vs bf16
    codes, scales = encode_sq(emb, rot)
    _, exact = dense_topk_np(emb, q, 10)
    vals, idx = sq_search(jnp.asarray(codes), jnp.asarray(scales), rot, q, 10,
                          emb_host=emb, candidates=100)
    recall = np.mean([len(set(idx[i]) & set(exact[i])) / 10 for i in range(16)])
    assert recall >= 0.95, f"sketch+refine recall@10: {recall}"
    np.testing.assert_allclose(
        vals[:, 0], np.einsum("bd,bd->b", emb[idx[:, 0]], q.astype(np.float32)),
        rtol=1e-5)


def test_padding_when_k_exceeds_corpus(rng):
    emb = _clustered(rng, n=30)
    rot = train_sq(emb, r=8)
    codes, scales = encode_sq(emb, rot)
    v, i = sq_search(jnp.asarray(codes), jnp.asarray(scales), rot, emb[:2], 50,
                     emb_host=emb)
    assert v.shape == (2, 50)
    assert (i[:, 30:] == -1).all()
