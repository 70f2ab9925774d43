"""LSH (ops/lsh.py) and native HNSW (native/anorag_native.cpp): the last
two FAISS index types behind index_type (ref vector_store/vector_index.py:
77-107). LSH = sign-sketch Hamming scan as ±1 int8 matmul + exact refine;
HNSW = C++ graph index for the small-batch regime."""
import numpy as np
import pytest

from anorag_tpu import native
from anorag_tpu.index.vector_index import VectorIndex
from anorag_tpu.ops.lsh import encode_lsh, lsh_search, train_lsh
from anorag_tpu.ops.topk import dense_topk_np


def _clustered(rng, n=1500, d=64, centers=40):
    c = rng.standard_normal((centers, d)).astype(np.float32) * 2.0
    rows = c[rng.integers(0, centers, n)] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    return rows.astype(np.float32)


def _recall(got, exact):
    k = exact.shape[1]
    return float(np.mean([
        len(set(got[i]) & set(exact[i])) / k for i in range(len(exact))
    ]))


# ------------------------------------------------------------------- LSH
def test_lsh_planes_orthonormal_blocks(rng):
    planes = train_lsh(64, 64)
    np.testing.assert_allclose(planes.T @ planes, np.eye(64), atol=1e-4)
    wide = train_lsh(32, 80)  # n_bits > D: QR blocks of width <= D
    assert wide.shape == (32, 80)
    np.testing.assert_allclose(
        wide[:, :32].T @ wide[:, :32], np.eye(32), atol=1e-4)


def test_lsh_codes_are_signs(rng):
    emb = _clustered(rng, n=300)
    planes = train_lsh(64, 128)
    codes = encode_lsh(emb, planes)
    assert codes.dtype == np.int8 and codes.shape == (300, 128)
    assert set(np.unique(codes)) <= {-1, 1}
    np.testing.assert_array_equal(
        np.asarray(codes), np.where(emb @ planes >= 0, 1, -1))


def test_lsh_search_refined_recall(rng):
    emb = _clustered(rng)
    q = emb[rng.choice(len(emb), 32, replace=False)] \
        + 0.05 * rng.standard_normal((32, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    planes = train_lsh(64, 256)
    import jax.numpy as jnp

    codes = jnp.asarray(encode_lsh(emb, planes))
    _, exact = dense_topk_np(emb, q, 10)
    vals, idx = lsh_search(codes, planes, q, 10, emb_host=emb, candidates=200)
    assert _recall(idx, exact) >= 0.9
    # refined scores are the exact inner products, descending
    assert np.all(np.diff(vals, axis=1) <= 1e-6)
    top = vals[:, 0]
    want = np.einsum("bd,bd->b", q, emb[idx[:, 0]])
    np.testing.assert_allclose(top, want, atol=1e-5)


def test_lsh_search_unrefined_selfmatch(rng):
    emb = _clustered(rng, n=400)
    import jax.numpy as jnp

    planes = train_lsh(64, 256)
    codes = jnp.asarray(encode_lsh(emb, planes))
    vals, idx = lsh_search(codes, planes, emb[:8], 4, emb_host=None)
    assert list(idx[:, 0]) == list(range(8))   # identical sketch wins
    assert np.all(vals <= 1.0 + 1e-6)          # agreement fraction scale


def test_vector_index_lsh_roundtrip(rng, tmp_path):
    emb = _clustered(rng, n=800)
    idx = VectorIndex(dimension=64, index_type="LSH", lsh_bits=256,
                      storage_dtype="float32")
    idx.add(emb)
    assert idx.measure_recall(emb[:32], top_k=10) >= 0.9
    res = idx.search(emb[:2], top_k=5)
    assert res[0][0]["index"] == 0 and res[1][0]["index"] == 1
    idx.save(tmp_path / "lsh")
    idx2 = VectorIndex.load(tmp_path / "lsh")
    assert idx2.index_type == "LSH" and idx2.lsh_bits == 256
    # planes persisted: identical results after reload
    s1, i1 = idx.search_arrays(emb[:8], 10)
    s2, i2 = idx2.search_arrays(emb[:8], 10)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


# ------------------------------------------------------------------ HNSW
needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native runtime unavailable")


@needs_native
def test_hnsw_native_recall(rng):
    emb = _clustered(rng)
    q = emb[rng.choice(len(emb), 32, replace=False)] \
        + 0.05 * rng.standard_normal((32, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    h = native.HNSWNative(emb, m=16, ef_construction=200)
    _, exact = dense_topk_np(emb, q, 10)
    scores, idx = h.search(q, 10, ef_search=128)
    assert _recall(idx, exact) >= 0.9
    # scores are true inner products, descending
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    np.testing.assert_allclose(
        scores[:, 0], np.einsum("bd,bd->b", q, emb[idx[:, 0]]), atol=1e-5)


@needs_native
def test_hnsw_deterministic_rebuild(rng):
    emb = _clustered(rng, n=500)
    a = native.HNSWNative(emb, seed=7).search(emb[:16], 5, ef_search=64)
    b = native.HNSWNative(emb, seed=7).search(emb[:16], 5, ef_search=64)
    np.testing.assert_array_equal(a[1], b[1])


@needs_native
def test_hnsw_k_exceeds_corpus(rng):
    emb = _clustered(rng, n=6)
    h = native.HNSWNative(emb)
    scores, idx = h.search(emb[:2], 6, ef_search=32)
    assert idx.shape == (2, 6)
    assert set(idx[0]) == set(range(6))  # tiny graph is fully reachable


@needs_native
def test_vector_index_hnsw_roundtrip(rng, tmp_path):
    emb = _clustered(rng, n=600)
    idx = VectorIndex(dimension=64, index_type="HNSW", hnsw_m=16,
                      storage_dtype="float32")
    idx.add(emb)
    assert idx.measure_recall(emb[:32], top_k=10) >= 0.9
    scores, ids = idx.search_arrays(emb[:4], top_k=10)
    assert list(ids[:, 0]) == [0, 1, 2, 3]
    idx.save(tmp_path / "hnsw")
    # the graph adjacency itself is persisted (parallel builds are NOT
    # interleaving-deterministic above 20k rows, so save/load must not
    # rebuild) — loaded index is the same object, bit for bit
    data = np.load(str((tmp_path / "hnsw").with_suffix(".npz")))
    assert "hnsw_meta" in data and "hnsw_links" in data
    idx2 = VectorIndex.load(tmp_path / "hnsw")
    assert idx2.index_type == "HNSW"
    assert not idx2._dirty  # imported, not queued for rebuild
    s2, i2 = idx2.search_arrays(emb[:4], top_k=10)
    np.testing.assert_array_equal(ids, i2)
    np.testing.assert_array_equal(scores, s2)


@needs_native
def test_hnsw_graph_export_import_identical(rng):
    emb = _clustered(rng, n=400)
    h = native.HNSWNative(emb, m=8, ef_construction=100, seed=3)
    g = h.export_graph()
    h2 = native.HNSWNative.from_graph(emb, g)
    s1, i1 = h.search(emb[:32], 10, ef_search=48)
    s2, i2 = h2.search(emb[:32], 10, ef_search=48)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(s1, s2)
    # corrupt blob is rejected, not segfaulted
    bad = dict(g)
    bad["links"] = g["links"][: max(len(g["links"]) // 2, 1)]
    try:
        native.HNSWNative.from_graph(emb, bad)
        raised = False
    except ValueError:
        raised = True
    assert raised
