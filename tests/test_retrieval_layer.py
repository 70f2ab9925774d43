"""Retrieval layer: retriever facade, hybrid, path ranker, guardrail,
diversity, learned fusion, planner, recall optimizer, reranker."""
import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.retrieval.diversity import DiversityScheduler
from anorag_tpu.retrieval.guardrail import RetrievalGuardrail
from anorag_tpu.retrieval.hybrid import HybridSearcher
from anorag_tpu.retrieval.learned_fusion import FEATURES, LearnedFusion, extract_features
from anorag_tpu.retrieval.path_aware_ranker import PathAwareRanker
from anorag_tpu.retrieval.query_planner import QueryPlan, QueryPlanner
from anorag_tpu.retrieval.recall_optimizer import EnhancedRecallOptimizer
from anorag_tpu.retrieval.reranker import ListwiseReranker, fuse_scores, sort_desc
from anorag_tpu.retrieval.retriever import VectorRetriever

from conftest import make_notes


def _em():
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 128)
    return EmbeddingManager(cfg=loader, singleton=False)


@pytest.fixture(scope="module")
def retriever():
    r = VectorRetriever(embedding_manager=_em(), index_type="Flat",
                        similarity_threshold=0.0, top_k=10)
    r.build_index(make_notes(24))
    return r


def test_search_returns_tagged_notes(retriever):
    res = retriever.search(["Aurora Lane singer Blue Horizon"], top_k=5)
    assert len(res) == 1 and res[0]
    top = res[0][0]
    assert "Aurora Lane" in top["entities"]
    assert top["retrieval_info"]["method"] == "dense"
    assert top["retrieval_info"]["rank"] == 0


def test_retrieve_boosts_and_penalties(retriever):
    base = retriever.retrieve("Aurora Lane", top_k=8, threshold=0.0)
    boosted = retriever.retrieve("Aurora Lane", top_k=8, threshold=0.0,
                                 boost_entities=["Quantum Leap Institute"])
    b_ids = {c["note_id"]: c["adjusted_score"] for c in boosted}
    for c in base:
        if "Quantum Leap Institute" in c["entities"]:
            assert b_ids[c["note_id"]] > c["similarity"]
    # must-have miss penalty
    pen = retriever.retrieve("Aurora Lane", top_k=8, threshold=0.0,
                             must_have_terms=["zzznotfound"])
    assert all(c["adjusted_score"] < c["similarity"] for c in pen)


def test_retrieve_filter_fn(retriever):
    res = retriever.retrieve("Aurora Lane", top_k=8, threshold=0.0,
                             filter_fn=lambda c: c["doc_id"] == "doc_0")
    assert res and all(c["doc_id"] == "doc_0" for c in res)


def test_incremental_add_remove(retriever):
    import copy

    r = VectorRetriever(embedding_manager=_em(), index_type="Flat",
                        similarity_threshold=0.0)
    r.build_index(make_notes(8))
    n0 = r.notes[0]["note_id"]
    new = {"note_id": "new_1", "title": "Unique Topic", "content": "A singular new fact.",
           "entities": ["Unique Topic"], "doc_id": "doc_x", "paragraph_idxs": [0]}
    r.add_notes([new])
    assert len(r.notes) == 9
    hits = r.retrieve("Unique Topic singular fact", top_k=3, threshold=0.0)
    assert hits[0]["note_id"] == "new_1"
    assert r.remove_notes([n0]) == 1
    assert all(n["note_id"] != n0 for n in r.notes)


def test_persistence_roundtrip(tmp_path, retriever):
    retriever.save(tmp_path)
    r2 = VectorRetriever(embedding_manager=_em(), index_type="Flat",
                         similarity_threshold=0.0)
    assert r2.load(tmp_path)
    assert len(r2.notes) == len(retriever.notes)
    a = retriever.retrieve("Aurora Lane", top_k=3, threshold=0.0)
    b = r2.retrieve("Aurora Lane", top_k=3, threshold=0.0)
    assert [x["note_id"] for x in a] == [x["note_id"] for x in b]


def test_signature_mismatch_blocks_load(tmp_path, retriever):
    retriever.save(tmp_path)
    other = ConfigLoader(auto_load=False)
    other.set("embedding.backend", "hash")
    other.set("embedding.dim", 64)   # different dim => different signature
    r2 = VectorRetriever(embedding_manager=EmbeddingManager(cfg=other, singleton=False))
    assert not r2.load(tmp_path)


def test_namespace_fallback(retriever):
    res = retriever.search_with_namespace_fallback("zzz qqq unfindable", "doc_1", top_k=3)
    assert all(c["doc_id"] == "doc_1" for c in res)


def test_hybrid_searcher_from_config():
    loader = ConfigLoader(auto_load=False)
    hs = HybridSearcher(loader)
    out = hs.fuse(dense=[("a", 0.9), ("b", 0.2)], bm25=[("b", 3.0)])
    assert out[0]["note_id"] in ("a", "b")
    assert all("final_similarity" in r for r in out)


def test_path_aware_ranker(notes):
    pr = PathAwareRanker()
    cands = [dict(n, final_score=0.5) for n in notes[:8]]
    out = pr.rerank_candidates("Who is the singer of Blue Horizon by Aurora Lane?", cands)
    assert len(out) == 8
    assert all("path_aware_score" in c and "path_info" in c for c in out)
    # notes covering query entities must rank above unrelated ones
    top_ents = set(map(str, out[0]["entities"]))
    assert top_ents & {"Aurora Lane", "Blue Horizon"}


def test_guardrail_fallback(notes):
    g = RetrievalGuardrail(notes, level="moderate")
    out = g.retrieve_with_guardrail("Aurora Lane Blue Horizon", primary=lambda q: [])
    assert out["source"] != "primary"
    assert out["results"]
    ok = g.retrieve_with_guardrail(
        "x", primary=lambda q: [dict(notes[0], final_score=0.9)]
    )
    assert ok["source"] == "primary"


def test_diversity_scheduler_dedups_and_diversifies(notes):
    dups = [dict(notes[0], final_score=0.9), dict(notes[0], final_score=0.8)]
    others = [dict(n, final_score=0.5) for n in notes[1:6]]
    ds = DiversityScheduler()
    out = ds.schedule_candidates(dups + others, top_k=4)
    ids = [c["note_id"] for c in out]
    assert len(set(ids)) == len(ids)
    assert ids.count(notes[0]["note_id"]) <= 1
    m = ds.coverage_metrics(out)
    assert m["n_selected"] == 4 and m["unique_docs"] >= 2


def test_diversity_type_quota(notes):
    cands = [dict(n, final_score=0.9, retrieval_method="dense") for n in notes[:5]]
    cands += [dict(n, final_score=0.1, retrieval_method="graph") for n in notes[5:8]]
    ds = DiversityScheduler(max_per_type={"dense": 2})
    out = ds.schedule_candidates(cands, top_k=4)
    assert sum(1 for c in out if c["retrieval_method"] == "dense") <= 2


def test_learned_fusion_train_and_rank():
    rng = np.random.default_rng(0)
    x = rng.random((200, len(FEATURES))).astype(np.float32)
    y = (x[:, 1] > 0.5).astype(np.float32)  # dense score drives the label
    lf = LearnedFusion()
    loss = lf.train(x, y, epochs=300)
    assert loss < 0.5
    pred = lf.score(x)
    acc = ((pred > 0.5) == y).mean()
    assert acc > 0.85


def test_learned_fusion_save_load(tmp_path):
    lf = LearnedFusion()
    lf.w = np.arange(len(FEATURES), dtype=np.float32)
    lf.b = 1.5
    lf.trained = True
    lf.save(tmp_path / "lf.json")
    lf2 = LearnedFusion.load(tmp_path / "lf.json")
    np.testing.assert_allclose(lf2.w, lf.w)
    assert lf2.b == 1.5


def test_query_planner_conjunction_split():
    qp = QueryPlanner()
    plan = qp.plan("Who directed Silent River and who composed its soundtrack?")
    assert len(plan.sub_queries) == 2


def test_query_planner_rewrite_with_llm():
    qp = QueryPlanner(llm_generate=lambda p: '{"rewritten": "better query"}')
    assert qp.rewrite("bad query") == "better query"
    qp2 = QueryPlanner()
    assert "Aurora" in qp2.rewrite("query", missing_entities=["Aurora"])


def test_query_planner_execute_merges():
    def retrieve(q):
        return [{"note_id": f"{q[:2]}_1", "final_score": 0.5}]

    qp = QueryPlanner()
    plan = QueryPlan(original="q", sub_queries=["aa", "bb"])
    merged = qp.execute(plan, retrieve)
    assert len(merged) == 2
    assert merged[0]["final_score"] >= merged[1]["final_score"]
    assert all("subq_source" in m for m in merged)


def test_recall_optimizer(notes):
    cands = [dict(n, final_score=0.5) for n in notes[:6]]
    cands.append(dict(cands[0]))  # duplicate
    calls = []

    def supp(q):
        calls.append(q)
        return [dict(notes[10], final_score=0.3)]

    ro = EnhancedRecallOptimizer(retrieve_fn=supp)
    out = ro.optimize_recall("Tell me about Zeta Unknown Entity", cands)
    ids = [c["note_id"] for c in out]
    assert len(ids) == len(set(ids))
    assert calls  # supplement triggered for uncovered entity


def test_recall_optimizer_multi_hop(notes):
    """Multi-hop sub-stage (parity: enhanced_recall_optimizer.py:448-540):
    hop queries decompose from query entities + relation cues, hop hits
    append tagged and threshold-filtered, comprehensive rerank boosts
    multi-hop evidence."""
    cands = [dict(n, final_score=0.5, content=n.get("content") or
                  "Aurora Lane is a singer from Boston town.")
             for n in notes[:3]]
    hop_calls = []

    def hop_fetch(q):
        hop_calls.append(q)
        return [dict(notes[11], similarity=0.4),
                dict(notes[12], similarity=0.05)]  # below threshold

    ro = EnhancedRecallOptimizer(
        retrieve_fn=None, multi_hop_enabled=True, max_hops=3,
        hop_similarity_threshold=0.15, graph_retrieve_fn=hop_fetch,
        comprehensive_rerank=True)
    hops = ro.decompose_multi_hop("Who is the spouse of Aurora Lane?")
    assert any("related to" in h for h in hops)
    assert any("marriage" in h for h in hops)
    assert len(hops) <= 3

    out = ro.optimize_recall("Who is the spouse of Aurora Lane?", cands)
    assert hop_calls
    added = [c for c in out
             if (c.get("optimization_info") or {}).get("multi_hop")]
    assert len(added) == 1  # the 0.05 hit filtered by the hop threshold
    assert all("comprehensive_score" in c for c in out)

    # toggle off: no hop retrieval, no comprehensive scores
    ro_off = EnhancedRecallOptimizer(
        retrieve_fn=None, multi_hop_enabled=False,
        graph_retrieve_fn=hop_fetch, comprehensive_rerank=False)
    hop_calls.clear()
    fresh = [dict(n, final_score=0.5, content=n.get("content") or
                  "Aurora Lane is a singer from Boston town.")
             for n in notes[:3]]
    out_off = ro_off.optimize_recall("Who is the spouse of Aurora Lane?",
                                     fresh)
    assert not hop_calls
    assert all("comprehensive_score" not in c for c in out_off)


def test_listwise_reranker_and_fusion(notes):
    rr = ListwiseReranker()
    cands = [dict(n, final_base_score=0.5) for n in notes[:6]]
    scores = rr.score("Aurora Lane Blue Horizon singer", cands)
    assert len(scores) == 6 and max(scores) > 0
    fused = fuse_scores(cands, scores)
    assert all("fused_score" in c for c in fused)
    ranked = sort_desc(fused, "fused_score")
    top_ents = set(map(str, ranked[0]["entities"]))
    assert top_ents & {"Aurora Lane", "Blue Horizon"}


def test_hybrid_search_batched(retriever):
    res = retriever.hybrid_search(["Aurora Lane Blue Horizon singer",
                                   "Quantum Leap Institute"], top_k=5)
    assert len(res) == 2 and res[0] and res[1]
    top0 = res[0][0]
    assert set(map(str, top0["entities"])) & {"Aurora Lane", "Blue Horizon"}
    assert "Elena Cortez" in res[1][0]["entities"]
    assert top0["retrieval_method"] == "hybrid"
    # scores sorted desc, no duplicate notes
    for rows in res:
        scores = [r["final_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        ids = [r["note_id"] for r in rows]
        assert len(set(ids)) == len(ids)


def test_optimize_retrieval_params(retriever):
    from anorag_tpu.retrieval.retriever import optimize_retrieval_params

    queries = ["Aurora Lane Blue Horizon", "Quantum Leap Institute Elena"]
    golds = [
        [n["note_id"] for n in retriever.notes if "Aurora Lane" in n["entities"]][:2],
        [n["note_id"] for n in retriever.notes if "Elena Cortez" in n["entities"]][:2],
    ]
    best = optimize_retrieval_params(retriever, queries, golds,
                                     top_k_grid=(2, 5), threshold_grid=(0.0, 0.3))
    assert best["f1"] > 0
    assert retriever.top_k == best["top_k"]
