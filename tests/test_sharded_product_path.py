"""Multi-chip product path: sharded search reachable from the user-facing
APIs (VectorIndex, VectorRetriever, QueryProcessor) and equal to the
single-device results on the 8-virtual-device CPU mesh (SURVEY §5.7/5.8;
ref vector_store/vector_index.py:206-263 is the single-host analogue)."""
import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.index.vector_index import VectorIndex
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.parallel.runtime import cfg_get, product_mesh, reset_mesh_cache
from anorag_tpu.retrieval.retriever import VectorRetriever


def _mesh():
    reset_mesh_cache()
    cfg = ConfigLoader(auto_load=False)
    cfg.set("tpu.sharded_search", "on")
    m = product_mesh(cfg)
    assert m is not None
    return m


def _em(dim=128):
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", dim)
    return EmbeddingManager(cfg=loader, singleton=False)


def test_cfg_get_dict_and_loader():
    assert cfg_get({"tpu": {"sharded_search": "off"}}, "tpu.sharded_search") == "off"
    loader = ConfigLoader(auto_load=False)
    loader.set("tpu.sharded_search", "on")
    assert cfg_get(loader, "tpu.sharded_search") == "on"
    assert cfg_get(None, "tpu.sharded_search", "auto") == "auto"


def test_product_mesh_off_and_on():
    reset_mesh_cache()
    cfg = ConfigLoader(auto_load=False)
    cfg.set("tpu.sharded_search", "off")
    assert product_mesh(cfg) is None
    m = _mesh()
    assert int(np.prod(list(m.shape.values()))) >= 2


@pytest.mark.parametrize("n", [300, 64])  # non-multiple + exact-multiple of 8 shards
def test_vector_index_sharded_matches_single(rng, n):
    mesh = _mesh()
    emb = rng.standard_normal((n, 64)).astype(np.float32)
    q = rng.standard_normal((5, 64)).astype(np.float32)
    kw = dict(dimension=64, index_type="Flat", storage_dtype="float32")
    single = VectorIndex(**kw)
    single.add(emb)
    sharded = VectorIndex(mesh=mesh, **kw)
    sharded.add(emb)
    assert sharded.is_sharded
    sv, si = single.search_arrays(q, 12)
    hv, hi = sharded.search_arrays(q, 12)
    np.testing.assert_allclose(sv, hv, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(si, hi)


def test_vector_index_sharded_k_exceeds_corpus(rng):
    mesh = _mesh()
    emb = rng.standard_normal((6, 32)).astype(np.float32)
    idx = VectorIndex(dimension=32, index_type="Flat", storage_dtype="float32",
                      mesh=mesh)
    idx.add(emb)
    v, i = idx.search_arrays(rng.standard_normal((2, 32)).astype(np.float32), 10)
    assert v.shape == (2, 10) and i.shape == (2, 10)
    assert (i[:, 6:] == -1).all()
    assert (i[:, :6] >= 0).all()


def test_retriever_hybrid_sharded_matches_single():
    from tests.conftest import make_notes

    notes = make_notes(40)
    mesh = _mesh()
    kw = dict(index_type="Flat", similarity_threshold=0.0, top_k=8)
    single = VectorRetriever(embedding_manager=_em(), **kw)
    single.build_index(notes)
    sharded = VectorRetriever(embedding_manager=_em(), mesh=mesh, **kw)
    sharded.build_index(notes)
    assert sharded.index.is_sharded
    queries = ["Who is the singer of Blue Horizon?",
               "Who founded Nexus Labs?"]
    a = single.hybrid_search(queries, top_k=8)
    b = sharded.hybrid_search(queries, top_k=8)
    for ra, rb in zip(a, b):
        assert [n["note_id"] for n in ra] == [n["note_id"] for n in rb]
        np.testing.assert_allclose(
            [n["final_score"] for n in ra],
            [n["final_score"] for n in rb], rtol=5e-3, atol=1e-3)


def test_retriever_dense_search_sharded_matches_single():
    from tests.conftest import make_notes

    notes = make_notes(40)
    mesh = _mesh()
    kw = dict(index_type="Flat", similarity_threshold=0.0, top_k=8)
    single = VectorRetriever(embedding_manager=_em(), **kw)
    single.build_index(notes)
    sharded = VectorRetriever(embedding_manager=_em(), mesh=mesh, **kw)
    sharded.build_index(notes)
    a = single.search(["Quantum Leap Institute scientist"], top_k=6)[0]
    b = sharded.search(["Quantum Leap Institute scientist"], top_k=6)[0]
    assert [n["note_id"] for n in a] == [n["note_id"] for n in b]


def test_query_processor_runs_sharded_end_to_end():
    from tests.test_query_processor import _cfg, _kb_notes

    reset_mesh_cache()
    cfg_on = _cfg(**{"tpu.sharded_search": "on"})
    cfg_off = _cfg(**{"tpu.sharded_search": "off"})
    from anorag_tpu.query.processor import QueryProcessor

    qp_on = QueryProcessor(_kb_notes(), cfg=cfg_on, llm=None)
    assert qp_on.mesh is not None
    assert qp_on.retriever.index.is_sharded
    qp_off = QueryProcessor(_kb_notes(), cfg=cfg_off, llm=None)
    assert qp_off.mesh is None
    q = "Who is the spouse of the performer of Blue Horizon?"
    r_on = qp_on.process(q)
    r_off = qp_off.process(q)
    assert r_on["answer"] == r_off["answer"]
    assert r_on["answer"]  # non-empty


def test_incremental_add_reshards(rng):
    mesh = _mesh()
    emb = rng.standard_normal((20, 32)).astype(np.float32)
    idx = VectorIndex(dimension=32, index_type="Flat", storage_dtype="float32",
                      mesh=mesh)
    idx.add(emb)
    _ = idx.search_arrays(emb[:2], 4)
    more = rng.standard_normal((13, 32)).astype(np.float32)
    idx.add(more)
    v, i = idx.search_arrays(more[:3], 4)
    # each query's own vector must be its nearest neighbour
    got_top1 = i[:, 0]
    oracle = VectorIndex(dimension=32, index_type="Flat", storage_dtype="float32")
    oracle.add(emb)
    oracle.add(more)
    ov, oi = oracle.search_arrays(more[:3], 4)
    np.testing.assert_array_equal(got_top1, oi[:, 0])
    np.testing.assert_allclose(v, ov, rtol=1e-5, atol=1e-5)
