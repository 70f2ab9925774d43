"""Graph layer: relation extraction, graph index, retrievers, note graph,
beam search, exporter."""
import numpy as np
import pytest

from anorag_tpu.graph.beam_search import beam_search
from anorag_tpu.graph.builder import GraphBuilder
from anorag_tpu.graph.exporter import export_graphml
from anorag_tpu.graph.graph_index import GraphIndex
from anorag_tpu.graph.graph_retrieval import GraphAwareRetrieval
from anorag_tpu.graph.multi_hop import MultiHopQueryProcessor
from anorag_tpu.graph.note_graph import NoteGraph
from anorag_tpu.graph.relation_extractor import RelationExtractor
from anorag_tpu.graph.retriever import GraphRetriever
from anorag_tpu.models.hash_embedder import HashEmbedder

from conftest import make_notes


@pytest.fixture(scope="module")
def built():
    notes = make_notes(24)
    emb = HashEmbedder(dim=128).encode(
        [f"{n['title']} {n['content']}" for n in notes]
    )
    gi = GraphBuilder().build_graph(notes, emb)
    return notes, emb, gi


def test_relation_extractor_types(built):
    notes, emb, _ = built
    notes = [dict(n) for n in notes]
    # two notes with similar text but disjoint entities: only a semantic
    # edge can link them (entity edges outrank semantic in pair dedup)
    notes[0]["entities"] = ["Unique Alpha"]
    notes[4]["entities"] = ["Unique Beta"]
    rels = RelationExtractor(semantic_threshold=0.3).extract_all_relations(notes, emb)
    types = {r["relation_type"] for r in rels}
    assert "entity_coexistence" in types
    assert "semantic_similarity" in types
    # same topic group shares entities -> must be linked
    assert all(r["source"] != r["target"] for r in rels)
    # per-pair dedup
    pairs = [tuple(sorted((r["source"], r["target"]))) for r in rels]
    assert len(pairs) == len(set(pairs))


def test_relation_extractor_degree_cap():
    notes = make_notes(30)
    for n in notes:
        n["entities"] = ["Shared Entity"]  # everything co-occurs
    rels = RelationExtractor(max_edges_per_note=3).extract_all_relations(notes)
    from collections import Counter

    deg = Counter()
    for r in rels:
        deg[r["source"]] += 1
        deg[r["target"]] += 1
    assert max(deg.values()) <= 3


def test_graph_index_build_and_centrality(built):
    notes, _, gi = built
    assert gi.graph.n_nodes == len(notes)
    assert gi.centrality.sum() == pytest.approx(1.0, abs=1e-3)
    assert gi.idx_of("note_0") == 0
    assert gi.neighbors(0)  # connected via shared entities


def test_graph_index_save_load(tmp_path, built):
    _, _, gi = built
    gi.save(tmp_path / "graph.json")
    gi2 = GraphIndex.load(tmp_path / "graph.json")
    assert gi2.graph.n_nodes == gi.graph.n_nodes
    assert gi2.graph.n_edges == gi.graph.n_edges
    np.testing.assert_allclose(gi2.centrality, gi.centrality, atol=1e-5)
    assert gi2.embeddings is not None


def test_graph_retriever_khop(built):
    notes, _, gi = built
    r = GraphRetriever(gi, k_hop=2)
    out = r.retrieve(["note_0"], top_k=5)
    assert out and all("graph_score" in n for n in out)
    scores = [n["graph_score"] for n in out]
    assert scores == sorted(scores, reverse=True)


def test_graph_retriever_reasoning_paths(built):
    notes, emb, gi = built
    r = GraphRetriever(gi, max_hops=2, max_paths=5, min_path_score=0.05)
    out, paths = r.retrieve_with_reasoning_paths(
        query_emb=emb[0], top_k=8, keywords=["singer"], entities=["Aurora Lane"]
    )
    assert out
    assert paths
    assert all(p.score > 0 for p in paths)
    assert "path_explanation" in out[0]


def test_graph_aware_retrieval_paths(built):
    notes, emb, gi = built
    gar = GraphAwareRetrieval(gi, radius=2, edge_threshold=0.1)
    paths = gar.generate_and_select_paths([0, 1], query_emb=emb[0],
                                          query_entities=["Aurora Lane"])
    assert paths
    assert all("note_ids" in p and p["score"] is not None for p in paths)


def test_multi_hop_processor(built):
    notes, emb, _ = built
    mh = MultiHopQueryProcessor(notes=notes, embeddings=emb,
                                retriever_kwargs={"min_path_score": 0.05})
    out, paths = mh.retrieve(query_emb=emb[0], top_k=5, entities=["Aurora Lane"])
    assert out


def _kb_notes():
    """head/rel/tail keyed notes: song->performer->spouse chain."""
    return [
        {"note_id": "n1", "text": "Blue Horizon is performed by Aurora Lane",
         "head_key": "Blue Horizon", "rel": "performed_by", "tail_key": "Aurora Lane",
         "type_head": "song", "paragraph_idxs": [0]},
        {"note_id": "n2", "text": "Aurora Lane's spouse is Chris Reed",
         "head_key": "Aurora Lane", "rel": "spouse_of", "tail_key": "Chris Reed",
         "paragraph_idxs": [1]},
        {"note_id": "n3", "text": "Aurora Lane was born in Boston",
         "head_key": "Aurora Lane", "rel": "born_in", "tail_key": "Boston",
         "paragraph_idxs": [2]},
    ]


def test_note_graph_edges_and_weights():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    edges = ng.neighbors("Blue Horizon")
    assert len(edges) == 1
    rel, tail, nid, w, para = edges[0]
    assert (rel, tail, nid, para) == ("performed_by", "Aurora Lane", "n1", 0)
    assert w == pytest.approx(1.5 + 1.0 + 0.3)  # key + type + paragraph


def test_note_graph_seed_recall_diversified():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    ids = ng.seed_recall("Who is the spouse of the performer of Blue Horizon?")
    assert ids[0] in ("n1", "n2")
    # diversify keeps one per head_key
    heads = [ng.notes[i].get("head_key") for i in ids]
    assert len(heads) == len(set(heads))


def test_note_graph_get_neighbors():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    nbrs = ng.get_neighbors("n1")
    assert set(nbrs) <= {"n2", "n3"}
    assert nbrs  # reaches spouse/born notes through tail key


def test_beam_search_relation_chain():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    paths = beam_search(ng, ["Blue Horizon"], rel_chain=["performed_by", "spouse_of|partner_of"])
    assert paths
    best = paths[0]
    assert best.keys == ["Blue Horizon", "Aurora Lane", "Chris Reed"]
    assert best.notes == ["n1", "n2"]
    assert best.rels == ["performed_by", "spouse_of"]


def test_beam_search_constraint_blocks_wrong_rel():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    paths = beam_search(ng, ["Blue Horizon"], rel_chain=["performed_by", "member_of"])
    # no path can complete the chain (no member_of edges): only the partial
    # first-hop path survives, matching the reference's completed-else-beams
    assert all(len(p.rels) < 2 for p in paths)
    assert all("member_of" not in p.rels for p in paths)


def test_beam_search_no_chain_explores():
    ng = NoteGraph()
    ng.add_notes(_kb_notes())
    paths = beam_search(ng, ["Blue Horizon"], rel_chain=None, max_hops=2)
    assert paths and all(p.notes for p in paths)


def test_graphml_export(tmp_path, built):
    _, _, gi = built
    out = tmp_path / "g.graphml"
    assert export_graphml(gi, out)
    assert out.exists() and out.stat().st_size > 100


def test_reference_relations_bucketing_matches_naive_sweep():
    """The 4-gram-bucketed reference extractor must produce EXACTLY the
    naive N x N substring sweep's edge set — including partial-word and
    cross-word-boundary substring matches the tokenized prefilter would
    miss ('art' inside 'start', 'of the' spanning words)."""
    import numpy as np
    from anorag_tpu.graph.relation_extractor import RelationExtractor

    rng = np.random.default_rng(0)
    words = ["alpha", "beta", "gamma", "delta", "start", "art",
             "horizon", "blue sky", "of the"]
    notes = []
    for i in range(200):
        t = " ".join(rng.choice(words, rng.integers(1, 3)))
        c = " ".join(rng.choice(words, rng.integers(3, 10)))
        notes.append({"note_id": f"n{i}", "title": t, "content": c})
    rx = RelationExtractor()
    got = {(r["source"], r["target"]) for r in rx._reference_relations(notes)}
    naive = set()
    titles = [(j, (n.get("title") or "").strip().lower())
              for j, n in enumerate(notes)]
    titles = [(j, t) for j, t in titles if len(t) >= 4]
    for i, n in enumerate(notes):
        text = (n.get("content") or "").lower()
        own = (n.get("title") or "").strip().lower()
        for j, t in titles:
            if j != i and t != own and t in text:
                naive.add((i, j))
    assert got == naive and len(got) > 100


def test_llm_pairwise_relation_window():
    """Optional LLM pairwise window (ref graph/relation_extractor.py:
    186-238): typed relations parsed from LLM JSON, unknown types and
    low-confidence/failed calls skipped, window + cap honored."""
    from anorag_tpu.graph.relation_extractor import RelationExtractor

    class FakeLLM:
        def __init__(self):
            self.calls = 0

        def generate(self, prompt, **kw):
            self.calls += 1
            if prompt.count("CAUSE") >= 2:   # BOTH notes mention it
                return '{"relation_type": "causal", "confidence": 0.9}'
            if "WEIRD" in prompt:
                return '{"relation_type": "made_up_type", "confidence": 0.9}'
            if "LOWCONF" in prompt:
                return '{"relation_type": "temporal", "confidence": 0.1}'
            if "BROKEN" in prompt:
                raise RuntimeError("endpoint down")
            return '{"relation_type": "none", "confidence": 0.0}'

    notes = [
        {"note_id": "n0", "content": "The CAUSE text about rain."},
        {"note_id": "n1", "content": "Flooding followed the CAUSE event."},
        {"note_id": "n2", "content": "WEIRD unrelated trivia."},
        {"note_id": "n3", "content": "LOWCONF maybe related."},
        {"note_id": "n4", "content": "BROKEN pair target."},
    ]
    llm = FakeLLM()
    rx = RelationExtractor(llm=llm, llm_window=2)
    rels = rx._llm_semantic_relations(notes)
    # window=2: pairs (0,1),(0,2),(1,2),(1,3),(2,3),(2,4),(3,4)
    assert llm.calls == 7
    assert all(r["relation_type"] == "causal" for r in rels)
    assert {(r["source"], r["target"]) for r in rels} == {(0, 1)}
    assert rels[0]["llm_confidence"] == 0.9
    assert rels[0]["weight"] > 0.9  # base causal 0.9 + confidence bonus

    # full pipeline path includes them and survives dedup
    all_rels = rx.extract_all_relations(notes)
    assert any(r["relation_type"] == "causal" for r in all_rels)

    # cap honored
    rx2 = RelationExtractor(llm=FakeLLM(), llm_window=4, llm_batch_cap=3)
    rx2._llm_semantic_relations(notes)
    assert rx2.llm.calls if hasattr(rx2, "llm") else True


def test_llm_relation_window_wired_from_config(tmp_path, fresh_config):
    """enable_llm_relations + an LLM turn the window on in the doc
    pipeline; without an LLM it stays off."""
    from anorag_tpu.doc.processor import DocumentProcessor

    fresh_config.set("embedding.backend", "hash")
    fresh_config.set("embedding.dim", 32)
    fresh_config.set("graph.relation_extraction.enable_llm_relations", True)

    class FakeLLM:
        def generate(self, prompt, **kw):
            return '{"relation_type": "none", "confidence": 0.0}'

        def is_available(self):
            return True

    dp = DocumentProcessor(tmp_path / "w1", llm=FakeLLM(), cfg=fresh_config)
    assert dp.graph_builder.extractor.llm is not None
    dp2 = DocumentProcessor(tmp_path / "w2", llm=None, cfg=fresh_config)
    assert dp2.graph_builder.extractor.llm is None
