"""k-means + IVF search parity vs per-query numpy oracle."""
import numpy as np
import pytest

from anorag_tpu.ops.ivf import build_ivf, ivf_probe, ivf_search, select_blocks, tune_nprobe
from anorag_tpu.ops.kmeans import auto_k, kmeans_fit, kmeans_inertia
from anorag_tpu.ops.topk import dense_topk_np


def _clustered_corpus(n=600, d=32, n_clusters=6, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, d)) * 4
    labels = rng.integers(0, n_clusters, n)
    x = centers[labels] + rng.standard_normal((n, d)) * 0.3
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32), labels


def test_kmeans_recovers_clusters():
    x, labels = _clustered_corpus()
    c, a = kmeans_fit(x, 6, iters=20)
    a = np.asarray(a)
    # cluster purity: each kmeans cluster should be dominated by one label
    purity = 0
    for k in range(6):
        members = labels[a == k]
        if len(members):
            purity += np.bincount(members).max()
    assert purity / len(labels) > 0.95


def test_kmeans_empty_cluster_safe():
    x = np.ones((5, 4), np.float32)
    c, a = kmeans_fit(x, 8, iters=3)
    assert np.isfinite(np.asarray(c)).all()


def test_auto_k_reasonable():
    x, _ = _clustered_corpus(n=300)
    k = auto_k(x, max_k=10, iters=8)
    assert 2 <= k <= 10


def test_ivf_layout_covers_corpus():
    x, _ = _clustered_corpus()
    layout, sorted_emb = build_ivf(x, nlist=6, block_rows=128)
    assert sorted(layout.perm.tolist()) == list(range(len(x)))
    assert (layout.cluster_ids[: layout.n] >= 0).all()


def test_select_blocks_union():
    x, _ = _clustered_corpus()
    layout, _ = build_ivf(x, nlist=6, block_rows=128)
    sel = np.array([[0, 1], [2, 3]], np.int32)
    blocks = select_blocks(layout, sel)
    assert (blocks[blocks >= 0] < layout.num_blocks).all()
    # power-of-two bucket
    assert bin(len(blocks)).count("1") == 1


@pytest.mark.parametrize("nprobe", [1, 3, 6])
def test_ivf_matches_numpy_oracle(nprobe):
    x, _ = _clustered_corpus()
    layout, sorted_emb = build_ivf(x, nlist=6, block_rows=128)
    rng = np.random.default_rng(1)
    q = rng.standard_normal((4, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    vals, idx = ivf_search(layout, sorted_emb, q, k=10, nprobe=nprobe,
                           use_pallas=True, interpret=True)
    ref_vals, ref_idx = ivf_search(layout, sorted_emb, q, k=10, nprobe=nprobe,
                                   use_pallas=False)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)


def test_full_probe_equals_flat():
    x, _ = _clustered_corpus(n=300)
    layout, sorted_emb = build_ivf(x, nlist=4, block_rows=128)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((3, x.shape[1])).astype(np.float32)
    vals, idx = ivf_search(layout, sorted_emb, q, k=5, nprobe=4,
                           use_pallas=True, interpret=True)
    flat_vals, flat_idx = dense_topk_np(x, q, 5)
    np.testing.assert_allclose(vals, flat_vals, rtol=1e-4, atol=1e-4)


def test_tune_nprobe_reaches_target():
    x, _ = _clustered_corpus(n=400)
    layout, sorted_emb = build_ivf(x, nlist=8, block_rows=128)
    rng = np.random.default_rng(3)
    q = rng.standard_normal((8, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    nprobe = tune_nprobe(layout, sorted_emb, x, q, k=5, target_recall=0.9,
                         use_pallas=False)
    _, idx = ivf_search(layout, sorted_emb, q, k=5, nprobe=nprobe, use_pallas=False)
    _, exact = dense_topk_np(x, q, 5)
    recall = np.mean([len(set(idx[i]) & set(exact[i])) / 5 for i in range(len(q))])
    assert recall >= 0.9
