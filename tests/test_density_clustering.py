"""Density clustering (ref doc/clustering.py:71-170 HDBSCAN/DBSCAN with
auto-eps): batched-matmul DBSCAN — blob recovery, noise labeling, border
adoption, auto-eps knee, and the TopicClustering method dispatch."""
import numpy as np
import pytest

from anorag_tpu.doc.clustering import (
    TopicClustering,
    density_cluster,
    find_optimal_eps,
    _pairwise_sq_dists,
)


def _blobs(rng, centers=3, per=20, d=8, spread=0.05, sep=5.0):
    pts, truth = [], []
    for c in range(centers):
        mu = np.zeros(d, np.float32)
        mu[c % d] = sep * (1 + c)
        pts.append(mu + spread * rng.standard_normal((per, d)).astype(np.float32))
        truth += [c] * per
    return np.concatenate(pts), np.array(truth)


def test_pairwise_sq_dists_matches_numpy(rng):
    x = rng.standard_normal((37, 5)).astype(np.float32)
    got = _pairwise_sq_dists(x, chunk=16)
    want = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_blob_recovery_with_auto_eps(rng):
    emb, truth = _blobs(rng)
    labels, eps = density_cluster(emb, min_samples=3)
    assert 0.05 <= eps <= 2.0
    assert (labels >= 0).all()          # tight blobs: nothing is noise
    assert len(set(labels.tolist())) == 3
    # every true blob maps to exactly one found label
    for c in range(3):
        assert len(set(labels[truth == c].tolist())) == 1


def test_noise_points_get_minus_one(rng):
    emb, _ = _blobs(rng, centers=2, per=15)
    outliers = np.full((2, 8), 50.0, np.float32) + rng.standard_normal((2, 8)).astype(np.float32) * 30
    labels, _ = density_cluster(np.concatenate([emb, outliers]), min_samples=3)
    assert (labels[-2:] == -1).all()
    assert len(set(labels[:-2].tolist()) - {-1}) == 2


def test_border_point_adopts_nearest_core():
    # a line of points at 0.05 spacing: interior points are cores (2
    # neighbours + self >= min_samples+1), the endpoints are borders
    # (only 1 neighbour) and must adopt the adjacent core's label
    emb = np.zeros((10, 4), np.float32)
    emb[:, 0] = np.arange(10) * 0.05
    labels, _ = density_cluster(emb, min_samples=2, eps=0.06)
    assert (labels == labels[0]).all()
    assert labels[0] >= 0


def test_explicit_eps_respected(rng):
    emb, _ = _blobs(rng, centers=2, per=10)
    _, eps = density_cluster(emb, min_samples=3, eps=0.42)
    assert eps == 0.42


def test_find_optimal_eps_monotone_band(rng):
    emb, _ = _blobs(rng)
    eps = find_optimal_eps(_pairwise_sq_dists(emb), min_samples=3)
    assert 0.05 <= eps <= 2.0


@pytest.mark.parametrize("method", ["dbscan", "hdbscan"])
def test_topic_clustering_density_dispatch(rng, method, notes):
    emb, _ = _blobs(rng, centers=4, per=6, d=16)
    out = TopicClustering(method=method).cluster_notes(notes, emb)
    assert out["n_clusters"] == 4
    assert "eps" in out
    assert len(out["labels"]) == len(notes)
    sizes = sum(p["size"] for p in out["topic_pools"])
    assert sizes == sum(1 for l in out["labels"] if l >= 0)


def test_empty_and_single(notes):
    tc = TopicClustering(method="dbscan")
    assert tc.cluster_notes([], np.zeros((0, 4)))["n_clusters"] == 0
    one = tc.cluster_notes(notes[:1], np.ones((1, 4), np.float32))
    assert one["labels"] == [0]
