"""Index layer: vector index (flat/IVF, save/load, recall), BM25 index,
entity inverted index, artifact store."""
import numpy as np
import pytest

from anorag_tpu.index.bm25_index import BM25Index, FieldWeightedBM25Index, note_text
from anorag_tpu.index.entity_index import EntityInvertedIndex, levenshtein_ratio
from anorag_tpu.index.store import ArtifactStore
from anorag_tpu.index.vector_index import VectorIndex
from anorag_tpu.ops.bm25 import bm25_scores_np
from anorag_tpu.utils.text import tokenize

from conftest import make_notes


def _vecs(n=200, d=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


# ------------------------------------------------------------ VectorIndex
def test_flat_index_search_cosine():
    v = _vecs()
    idx = VectorIndex(dimension=64, index_type="Flat", storage_dtype="float32")
    idx.add(v)
    res = idx.search(v[:3], top_k=5)
    assert len(res) == 3
    # self-match first with similarity ~1
    for qi, rows in enumerate(res):
        assert rows[0]["index"] == qi
        assert rows[0]["similarity"] == pytest.approx(1.0, abs=1e-4)
        assert rows[0]["rank"] == 0


def test_ivf_index_recall_and_autotune():
    v = _vecs(400)
    idx = VectorIndex(dimension=64, index_type="IVFFlat", nlist=8, nprobe=1,
                      storage_dtype="float32", ivf_min_corpus=0)
    idx.add(v)
    q = _vecs(8, seed=3)
    idx.optimize_search_params(q, top_k=5, target_recall=0.9)
    assert idx.measure_recall(q, top_k=5) >= 0.9


def test_nlist_shrinks_for_small_corpus():
    idx = VectorIndex(dimension=16, index_type="IVFFlat", nlist=64,
                      storage_dtype="float32", ivf_min_corpus=0)
    idx.add(_vecs(20, 16))
    idx._materialize()
    assert idx._layout.nlist <= 16


def test_ivf_auto_flat_below_threshold():
    """Small corpora use the flat scan even when IVFFlat is configured —
    on TPU brute force beats pruning below ~1M rows."""
    idx = VectorIndex(dimension=16, index_type="IVFFlat", storage_dtype="float32")
    idx.add(_vecs(50, 16))
    idx._materialize()
    assert idx._effective_type == "Flat" and idx._layout is None
    assert idx.measure_recall(_vecs(4, 16, seed=9), top_k=5) == 1.0


def test_index_type_spellings():
    # every reference index_type is a real index now; "PQ" is accepted as
    # a spelling of IVFPQ, and HNSW only degrades without the native lib
    from anorag_tpu import native

    expect_hnsw = "HNSW" if native.available() else "Flat"
    assert VectorIndex(dimension=16, index_type="HNSW").index_type == expect_hnsw
    assert VectorIndex(dimension=16, index_type="LSH").index_type == "LSH"
    assert VectorIndex(dimension=16, index_type="IVFPQ").index_type == "IVFPQ"
    assert VectorIndex(dimension=16, index_type="PQ").index_type == "IVFPQ"


def test_save_load_roundtrip(tmp_path):
    v = _vecs(50)
    idx = VectorIndex(dimension=64, index_type="Flat", storage_dtype="float32")
    idx.add(v)
    idx.save(tmp_path / "vi")
    idx2 = VectorIndex.load(tmp_path / "vi")
    assert idx2.ntotal == 50
    r1 = idx.search_arrays(v[:2], 3)
    r2 = idx2.search_arrays(v[:2], 3)
    np.testing.assert_allclose(r1[0], r2[0], atol=1e-5)
    assert (r1[1] == r2[1]).all()


def test_empty_index_search():
    idx = VectorIndex(dimension=8, index_type="Flat")
    scores, ids = idx.search_arrays(np.zeros((2, 8), np.float32), 4)
    assert (ids == -1).all()


# -------------------------------------------------------------- BM25Index
def test_bm25_index_matches_oracle(notes):
    bi = BM25Index(notes, text_field="title_raw_span", k1=1.5, b=0.75)
    q = "Aurora Lane singer"
    scores = bi.scores([q], normalize=False)[0]
    docs = [bi.vocab.encode(tokenize(note_text(n)), grow=False) for n in notes]
    want = bm25_scores_np(docs, [bi.query_terms(q)])[0]
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)
    # notes about Aurora Lane should outrank others
    top = np.argmax(scores)
    assert "Aurora Lane" in notes[top]["entities"]


def test_bm25_topk(notes):
    bi = BM25Index(notes)
    s, idx = bi.topk("Quantum Leap Institute", k=5)
    assert len(idx) == 5
    assert s[0] >= s[-1]
    assert "Elena Cortez" in notes[idx[0]]["entities"]


def test_field_weighted_index(notes):
    fwi = FieldWeightedBM25Index(notes)
    s = fwi.scores(["Blue Horizon"], normalize=False)[0]
    assert s.max() > 0
    assert "Blue Horizon" in notes[int(np.argmax(s))]["entities"]


# ------------------------------------------------------------ EntityIndex
def test_levenshtein_ratio():
    assert levenshtein_ratio("kitten", "kitten") == 1.0
    assert levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)


def test_entity_index_lookup(notes):
    ei = EntityInvertedIndex()
    ei.build_index(notes)
    hits = ei.lookup("Aurora Lane")
    assert hits and all(h.startswith("note_") for h in hits)
    # fuzzy
    assert ei.lookup("Aurora Lanes") == hits


def test_entity_index_remove_and_persist(tmp_path, notes):
    ei = EntityInvertedIndex()
    ei.build_index(notes[:4])
    before = ei.candidates_for_entities(["Aurora Lane"])
    ei.remove_note(before[0])
    after = ei.candidates_for_entities(["Aurora Lane"])
    assert before[0] not in after
    ei.save(tmp_path / "ei.json")
    ei2 = EntityInvertedIndex.load(tmp_path / "ei.json")
    assert ei2.candidates_for_entities(["Aurora Lane"]) == after


# ---------------------------------------------------------- ArtifactStore
def test_artifact_store_staleness(tmp_path):
    store = ArtifactStore(tmp_path)
    cfg = {"a": 1}
    builds = []

    def run():
        return store.cached(
            "x", cfg, "h1",
            build=lambda: builds.append(1) or {"v": len(builds)},
            save=lambda obj: store.save_json("x", obj, cfg, "h1"),
            load=lambda: store.load_json("x"),
        )

    o1 = run()
    o2 = run()
    assert len(builds) == 1 and o1 == o2
    cfg["a"] = 2  # config change -> stale
    run()
    assert len(builds) == 2


def test_artifact_store_arrays(tmp_path):
    store = ArtifactStore(tmp_path)
    store.save_arrays("emb", {"c": 1}, "h", x=np.arange(6).reshape(2, 3))
    assert store.is_fresh("emb", {"c": 1}, "h")
    assert not store.is_fresh("emb", {"c": 2}, "h")
    back = store.load_arrays("emb")
    assert back["x"].shape == (2, 3)
