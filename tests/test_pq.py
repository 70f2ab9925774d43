"""Product quantization: codebook training, encoding, ADC one-hot-matmul
scan, exact refine, and the VectorIndex IVFPQ integration (ref
vector_store/vector_index.py:77-107 — IVFPQ no longer aliases to
IVFFlat)."""
import numpy as np
import pytest

import jax.numpy as jnp

from anorag_tpu.index.vector_index import VectorIndex
from anorag_tpu.ops.pq import encode_pq, pq_lut, pq_search, pq_topk, train_pq
from anorag_tpu.ops.topk import dense_topk_np


def _clustered(rng, n=1200, d=64, centers=30):
    """Clustered corpus (PQ assumes codebook-compressible structure)."""
    c = rng.standard_normal((centers, d)).astype(np.float32) * 2.0
    rows = c[rng.integers(0, centers, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    return rows.astype(np.float32)


def test_train_encode_shapes(rng):
    emb = _clustered(rng)
    cb = train_pq(emb, m=8, n_centroids=64, iters=8)
    assert cb.shape == (8, 64, 8)
    # scarce corpora: K padded up to the request so code width is stable
    small = train_pq(emb[:100], m=8, n_centroids=256, iters=4)
    assert small.shape == (8, 256, 8)
    codes = encode_pq(emb, cb)
    assert codes.shape == (1200, 8) and codes.dtype == np.uint8


def test_adc_matches_reconstruction_score(rng):
    """The one-hot matmul scan must equal sum_m LUT[m, code] exactly."""
    emb = _clustered(rng, n=400)
    q = rng.standard_normal((3, 64)).astype(np.float32)
    cb = train_pq(emb, m=8, n_centroids=32, iters=5)
    codes = encode_pq(emb, cb)
    lut = np.asarray(pq_lut(jnp.asarray(q), jnp.asarray(cb)))
    oracle = np.zeros((3, 400), np.float32)
    for m in range(8):
        oracle += lut[:, m, codes[:, m]]
    vals, idx = pq_topk(jnp.asarray(codes), jnp.asarray(lut), 10, chunk=128)
    vals, idx = np.asarray(vals), np.asarray(idx)
    want = np.sort(oracle, axis=1)[:, ::-1][:, :10]
    np.testing.assert_allclose(vals, want, rtol=2e-2, atol=2e-2)  # bf16 onehot matmul
    # chosen ids must score within bf16 slack of the true 10th-best ADC value
    for b in range(3):
        floor = np.sort(oracle[b])[::-1][9]
        assert (oracle[b][idx[b]] >= floor - 0.05).all()


def test_pq_search_refine_recall(rng):
    emb = _clustered(rng, n=2000)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, 2000, 16)] + 0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    cb = train_pq(emb, m=8, n_centroids=256, iters=10)
    codes = encode_pq(emb, cb)
    _, exact = dense_topk_np(emb, q, 10)
    vals, idx = pq_search(jnp.asarray(codes), cb, q, 10,
                          emb_host=emb, candidates=100)
    recall = np.mean([len(set(idx[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert recall >= 0.95, f"PQ+refine recall@10 too low: {recall}"
    # refined scores are exact inner products
    np.testing.assert_allclose(
        vals[:, 0], np.einsum("bd,bd->b", emb[idx[:, 0]], q), rtol=1e-5)


def test_pq_search_padding_when_k_exceeds_corpus(rng):
    emb = _clustered(rng, n=40)
    cb = train_pq(emb, m=8, n_centroids=16, iters=4)
    codes = encode_pq(emb, cb)
    v, i = pq_search(jnp.asarray(codes), cb, emb[:2], 50, emb_host=emb)
    assert v.shape == (2, 50)
    assert (i[:, 40:] == -1).all()


@pytest.mark.parametrize("impl", ["sketch", "codebook"])
def test_vector_index_ivfpq_end_to_end(rng, impl):
    emb = _clustered(rng, n=1500)
    idx = VectorIndex(dimension=64, index_type="IVFPQ", metric="cosine",
                      pq_impl=impl)
    idx.add(emb)
    assert idx._effective_type == "IVFPQ"
    q = emb[rng.integers(0, 1500, 8)]
    scores, ids = idx.search_arrays(q, 10)
    assert scores.shape == (8, 10)
    # normalized self-query must rank itself first (exact refine)
    res = idx.search(q[:2], top_k=5)
    assert res[0][0]["score"] > 0.99


@pytest.mark.parametrize("impl", ["sketch", "codebook"])
def test_vector_index_ivfpq_save_load_roundtrip(rng, tmp_path, impl):
    emb = _clustered(rng, n=300)
    idx = VectorIndex(dimension=64, index_type="IVFPQ", pq_m=8, pq_rerank=64,
                      pq_impl=impl)
    idx.add(emb)
    q = emb[:4]
    v1, i1 = idx.search_arrays(q, 8)
    idx.save(tmp_path / "pq_index")
    idx2 = VectorIndex.load(tmp_path / "pq_index")
    assert idx2.index_type == "IVFPQ" and idx2.pq_m == 8
    assert idx2.pq_impl == impl
    if impl == "codebook":
        assert idx2._pq_codebooks is not None
    else:
        assert idx2._sq_rotation is not None
    v2, i2 = idx2.search_arrays(q, 8)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)


@pytest.mark.parametrize("impl", ["sketch", "codebook"])
def test_memory_reduction_factor(rng, impl):
    """Driver contract: >= 4x device-memory reduction vs bf16 flat rows."""
    emb = _clustered(rng, n=512, d=64)
    idx = VectorIndex(dimension=64, index_type="IVFPQ", pq_impl=impl)
    idx.add(emb)
    idx._materialize()
    codes = idx._pq_codes if impl == "codebook" else idx._sq_codes
    code_bytes = codes.size * codes.dtype.itemsize
    flat_bf16_bytes = 512 * 64 * 2
    assert flat_bf16_bytes / code_bytes >= 4, (flat_bf16_bytes, code_bytes)
