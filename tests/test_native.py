"""Native C++ runtime vs Python implementations."""
import numpy as np
import pytest

from anorag_tpu import native
from anorag_tpu.index.entity_index import levenshtein_ratio
from anorag_tpu.ops.bm25 import bm25_scores, bm25_scores_np, build_postings
from anorag_tpu.utils.text import tokenize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")

TEXTS = [
    "Aurora Lane is the singer of Blue Horizon",
    "The album Blue Horizon sold a million copies",
    "Marcus Webb directed Silent River in 2001",
    "Nexus Labs was founded by David Kim",
]


def test_native_bm25_matches_python():
    postings, vocab = native.build_postings_native(TEXTS, k1=1.5, b=0.75)
    # python reference over the same tokenization
    doc_terms = [[vocab[t] for t in tokenize(x) if t in vocab] for x in TEXTS]
    ref = build_postings(doc_terms, len(vocab), k1=1.5, b=0.75)
    np.testing.assert_array_equal(postings.term_offsets, ref.term_offsets)
    np.testing.assert_allclose(postings.idf, ref.idf, rtol=1e-6)
    # postings may order docs identically (both insert in doc order)
    np.testing.assert_array_equal(postings.doc_ids, ref.doc_ids)
    np.testing.assert_allclose(postings.weights, ref.weights, rtol=1e-6)


def test_native_bm25_end_to_end_scoring():
    postings, vocab = native.build_postings_native(TEXTS)
    q = [vocab[t] for t in tokenize("blue horizon album") if t in vocab]
    scores = bm25_scores(postings, [q])
    want = bm25_scores_np(
        [[vocab[t] for t in tokenize(x) if t in vocab] for x in TEXTS], [q])
    np.testing.assert_allclose(scores, want, rtol=1e-5, atol=1e-6)
    assert int(np.argmax(scores[0])) in (0, 1)


def test_native_levenshtein_matches_python():
    pairs = [("kitten", "sitting"), ("abc", "abc"), ("", "x"), ("flaw", "lawn")]
    for a, b in pairs:
        got = native.levenshtein_ratio_native(a, b)
        assert got == pytest.approx(levenshtein_ratio(a, b))


def test_native_tokenize_count():
    lib = native.load()
    text = "Hello, World! it's 2024".encode()
    assert lib.anorag_tokenize_count(text, len(text)) == len(tokenize("Hello, World! it's 2024"))


def _random_candidates(rng, n_cands=30, n_ents=40):
    ents = [f"entity {chr(65+i)}{i}" for i in range(n_ents)]
    cands = []
    for _ in range(n_cands):
        k = rng.integers(2, 7)
        chosen = list(rng.choice(n_ents, size=k, replace=False))
        cands.append({
            "title": "t", "content": "c",
            "entities": [ents[j] for j in chosen],
            "final_score": float(rng.random()),
        })
    return ents, cands


def test_pathrank_native_matches_python_fallback():
    from anorag_tpu.retrieval.path_aware_ranker import PathAwareRanker

    rng = np.random.default_rng(3)
    ranker = PathAwareRanker()
    for trial in range(5):
        ents, cands = _random_candidates(rng)
        q_entities = [e.lower() for e in rng.choice(ents, size=3, replace=False)]
        exp_n, contrib_n = ranker._graph_features(cands, q_entities, use_native=True)
        exp_p, contrib_p = ranker._graph_features(cands, q_entities, use_native=False)
        assert exp_n == exp_p, f"trial {trial}: k-hop expansion differs"
        np.testing.assert_array_equal(contrib_n, contrib_p)


def test_pathrank_native_empty_graph():
    from anorag_tpu.retrieval.path_aware_ranker import PathAwareRanker

    ranker = PathAwareRanker()
    cands = [{"title": "", "content": "", "entities": []}]
    exp, contrib = ranker._graph_features(cands, ["nobody"])
    assert exp == set() and contrib.tolist() == [0]
