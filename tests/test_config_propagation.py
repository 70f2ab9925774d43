"""Config toggles must reach the QueryProcessor's internals.

Mirrors the reference's stub-based config-propagation suite
(/root/reference/tests/test_config_propagation.py,
test_graph_retriever_config.py, test_query_processor_safety.py).
"""
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.query.processor import QueryProcessor

from conftest import make_notes


def _cfg(**overrides):
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 64)
    loader.set("vector_store.index_type", "Flat")
    for k, v in overrides.items():
        loader.set(k, v)
    return loader


def _qp(**overrides):
    return QueryProcessor(make_notes(8), cfg=_cfg(**overrides))


def test_safety_config_reaches_filter():
    qp = _qp(**{"safety.per_hop_keep_top_m": 2, "safety.lower_threshold": 0.5})
    assert qp.per_hop_keep_top_m == 2
    assert qp.lower_threshold == 0.5
    kept = qp._filter_with_multihop_safety(
        [{"note_id": f"x{i}", "final_score": 0.01, "hop_no": 1} for i in range(6)])
    assert len(kept) == 2


def test_cluster_suppression_config():
    qp = _qp(**{"safety.cluster.enabled": True, "safety.cluster.cos_threshold": 0.5,
                "safety.cluster.keep_per_cluster": 1})
    assert qp.cluster_suppress_enabled
    assert qp.cluster_cos_threshold == 0.5
    assert qp.keep_per_cluster == 1


def test_retrieval_multi_hop_overrides_reach_graph_retriever():
    """retrieval.multi_hop wins over legacy multi_hop (the alias contract)."""
    qp = _qp(**{"retrieval.multi_hop.max_hops": 5,
                "retrieval.multi_hop.max_paths": 3})
    assert qp.multi_hop.retriever.max_hops == 5
    assert qp.multi_hop.retriever.max_paths == 3


def test_multi_hop_disable():
    qp = _qp(**{"retrieval.multi_hop.enabled": False})
    assert qp.multi_hop is None


def test_lexical_fallback_config():
    qp = _qp(**{"hybrid_search.lexical_fallback.miss_penalty": 0.3,
                "hybrid_search.lexical_fallback.noise_threshold": 0.05})
    assert qp.miss_penalty == 0.3
    assert qp.noise_threshold == 0.05


def test_two_hop_config():
    qp = _qp(**{"hybrid_search.two_hop_expansion.enabled": False,
                "hybrid_search.two_hop_expansion.max_second_hop_candidates": 3})
    assert not qp.two_hop_enabled
    assert qp.two_hop_max_second == 3


def test_dispatcher_config_propagates():
    qp = _qp(**{"context_dispatcher.final_semantic_count": 3,
                "context_dispatcher.bridge_policy": "boost"})
    assert qp.dispatcher.final_semantic_count == 3
    assert qp.dispatcher.bridge_policy == "boost"


def test_dispatcher_legacy_alias_propagates():
    """Setting the legacy `dispatcher` key flows through alias sync."""
    loader = ConfigLoader(auto_load=False)
    loader.apply_overrides({"dispatcher": {"final_semantic_count": 11}})
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 64)
    loader.set("vector_store.index_type", "Flat")
    qp = QueryProcessor(make_notes(8), cfg=loader)
    assert qp.dispatcher.final_semantic_count == 11


def test_answer_selector_toggle():
    qp = _qp(**{"answer_selector.enabled": False})
    assert not qp.answer_selector_enabled


def test_context_budget_reaches_scheduler():
    qp = _qp(**{"context.max_notes_for_llm": 7})
    assert qp.scheduler.max_notes == 7


def test_rerank_toggle_builds_reranker():
    qp = _qp(**{"rerank.enabled": True, "rerank.listt5_input_topk": 6})
    assert qp.reranker is not None
    assert qp.reranker.max_candidates == 6
    qp2 = _qp(**{"rerank.enabled": False})
    assert qp2.reranker is None


def test_bm25_params_reach_index():
    qp = _qp(**{"hybrid_search.bm25.k1": 2.0})
    # k1 affects postings weights; just assert construction didn't fall back
    assert qp.bm25.n_docs == 8


def test_reference_config_loads_cleanly():
    """The reference repo's own config.yaml merges with ZERO unknown keys —
    the full user-facing config surface is accepted."""
    import yaml

    user = yaml.safe_load(open("/root/reference/config.yaml"))
    loader = ConfigLoader(auto_load=False)
    loader.apply_overrides(user)
    rep = loader.report()
    assert rep["unknown_keys"] == []
    # spot-check merged values survive
    assert loader.get("retrieval.candidate_pool") == 80
    assert loader.get("retrieval.bm25_topk_hop1") == 40
    assert loader.get("embedding.model_name") == "BAAI/bge-m3"


def test_recall_pool_knobs_propagate():
    qp = _qp(**{"retrieval.bm25_topk_hop1": 7, "retrieval.embed_topk_hop1": 5})
    res = qp.process("Aurora Lane")
    assert res["trace"]["n_dense"] <= 5


def test_graph_aware_dispatcher_wiring():
    qp = _qp(**{"retrieval.use_graph_rerank": True,
                "retrieval.alpha": 0.7, "retrieval.edge_thresh": 0.2})
    assert qp.dispatcher.use_graph_aware
    assert qp.dispatcher.gar is not None
    assert qp.dispatcher.gar.alpha == 0.7
    assert qp.dispatcher.gar.edge_threshold == 0.2
    # dispatch still runs end-to-end in graph-aware mode
    res = qp.process("Aurora Lane Blue Horizon")
    assert "answer" in res


def test_index_params_reach_vector_index():
    """vector_store.{lsh_bits,hnsw_m,ef_*,pq_*} flow QueryProcessor ->
    VectorRetriever -> VectorIndex (the new real index types)."""
    qp = _qp(**{"vector_store.index_type": "LSH",
                "vector_store.lsh_bits": 32,
                "vector_store.pq_rerank": 48})
    idx = qp.retriever.index
    assert idx.index_type == "LSH"
    assert idx.lsh_bits == 32 and idx.pq_rerank == 48
    qp.retriever.search(["Blue Horizon"], top_k=3)   # forces materialize
    assert idx._lsh_codes.shape == (8, 32)   # codes built at 32 bits

    qp2 = _qp(**{"vector_store.index_type": "IVFPQ",
                 "vector_store.pq_impl": "codebook",
                 "vector_store.pq_m": 16})
    assert qp2.retriever.index.pq_impl == "codebook"
    assert qp2.retriever.index.pq_m == 16


def test_serving_stream_config_defaults():
    cfg = _cfg()
    assert cfg.get("serving.stream_batch") == 64
    assert cfg.get("serving.stream_depth") == 3
