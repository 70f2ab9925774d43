"""Offline document pipeline: chunker, clustering, incremental cache,
consistency, DocumentProcessor end-to-end (LLM-free rule notes)."""
import json

import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.doc.chunker import DocumentChunker
from anorag_tpu.doc.clustering import TopicClustering
from anorag_tpu.doc.consistency import ConsistencyChecker
from anorag_tpu.doc.incremental import IncrementalProcessor
from anorag_tpu.doc.processor import DocumentProcessor
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.models.hash_embedder import HashEmbedder

from conftest import make_notes

DOC = {
    "id": "doc1",
    "title": "Aurora Lane",
    "text": (
        "Aurora Lane is an American singer. She released Blue Horizon in 1999. "
        "The album sold a million copies.\n\n"
        "Lane married Chris Reed in 2003. They live in Boston. "
        "Reed founded Nexus Labs."
    ),
}

MUSIQUE_DOC = {
    "id": "m1",
    "paragraphs": [
        {"idx": 0, "title": "Blue Horizon", "paragraph_text": "Blue Horizon is an album by Aurora Lane."},
        {"idx": 1, "title": "Aurora Lane", "paragraph_text": "Aurora Lane married Chris Reed."},
    ],
}


def test_chunker_paragraph_and_sentence_structure():
    ch = DocumentChunker(max_chunk_chars=100)
    chunks = ch.chunk_document(DOC)
    assert chunks
    assert all(c["doc_id"] == "doc1" for c in chunks)
    # paragraph idxs preserved
    assert {c["paragraph_idx"] for c in chunks} == {0, 1}
    # sentence budget respected
    assert all(len(c["text"]) <= 120 for c in chunks)
    # chunk_index sequential
    assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))


def test_chunker_musique_paragraphs():
    ch = DocumentChunker()
    chunks = ch.chunk_document(MUSIQUE_DOC)
    assert {c["paragraph_idx"] for c in chunks} == {0, 1}


def test_chunker_overlap():
    ch = DocumentChunker(max_chunk_chars=80, overlap_chars=40)
    chunks = ch.chunk_document(DOC)
    texts = [c["text"] for c in chunks]
    # some sentence should repeat across adjacent chunks
    assert any(
        any(s in texts[i + 1] for s in chunks[i]["sentences"])
        for i in range(len(chunks) - 1)
    )


def test_chunker_event_aware():
    ch = DocumentChunker(max_chunk_chars=300, strategy="event_aware")
    chunks = ch.chunk_document(DOC)
    # married + founded cues keep neighbors together
    joined = [c["text"] for c in chunks]
    assert any("married" in t for t in joined)


def test_event_chain_boundary_extension():
    """Related events split across base-piece boundaries are pulled into
    one chunk (ref chunker.py:427-517): an acquisition sentence and an
    ownership sentence within the window end up together, with
    event_chain_optimized metadata."""
    filler = "The weather report mentioned light rain. "
    text = ("Acme Corp acquired Beta Ltd in 2001. " + filler * 4 +
            "Beta Ltd remains a subsidiary owned by Acme Corp. " + filler * 3)
    # budget sized so the extended chain (~260 chars) fits under the 1.5x
    # oversize cap; a smaller budget would (correctly) split the chain by
    # proximity groups instead
    ch = DocumentChunker(max_chunk_chars=200, strategy="event_aware")
    chunks = ch.chunk_document({"id": "d", "text": text})
    opt = [c for c in chunks if c.get("event_chain_optimized")]
    assert opt, [c["text"] for c in chunks]
    assert any("acquired" in c["text"] and "owned" in c["text"] for c in opt), \
        [c["text"] for c in opt]
    # metadata carries the related event types
    assert any(any("acquisition" in types or "ownership" in types
                   for types in c.get("related_events", c.get("event_group", [])))
               for c in opt)


def test_event_chain_oversize_split_groups():
    """An extended chain larger than 1.5x the budget splits by event
    proximity groups (ref chunker.py:564-621) instead of one giant chunk."""
    far = "Unrelated filler sentence about scenery and travel plans. " * 10
    text = ("Acme acquired Beta. Beta was owned by Gamma. " + far +
            "Delta merged with Epsilon. Epsilon acquired Zeta. " + far)
    ch = DocumentChunker(max_chunk_chars=100, strategy="event_aware")
    chunks = ch.chunk_document({"id": "d", "text": text})
    for c in chunks:
        assert len(c["text"]) <= 100 * 1.5 + 80, len(c["text"])
    # the two distant event groups land in different chunks
    has_acq = [i for i, c in enumerate(chunks) if "acquired Beta" in c["text"]]
    has_merge = [i for i, c in enumerate(chunks) if "merged with Epsilon" in c["text"]]
    assert has_acq and has_merge and has_acq[0] != has_merge[0]


def test_event_aware_no_events_matches_sentence_pack():
    text = "Plain first sentence here. Another neutral sentence follows. " * 6
    a = DocumentChunker(max_chunk_chars=150, strategy="event_aware")
    b = DocumentChunker(max_chunk_chars=150, strategy="sentence")
    ca = [c["text"] for c in a.chunk_document({"id": "d", "text": text})]
    cb = [c["text"] for c in b.chunk_document({"id": "d", "text": text})]
    assert ca == cb


def test_chunker_filters_junk():
    ch = DocumentChunker(min_chunk_chars=20)
    chunks = ch.chunk_document({"id": "x", "text": "!!! ??? ###\n\nok"})
    assert chunks == []


def test_chunk_file_roundtrip(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(json.dumps(DOC) + "\n")
    ch = DocumentChunker()
    assert ch.chunk_file(p)
    t = tmp_path / "doc.txt"
    t.write_text("Plain text document. With two sentences.")
    assert ch.chunk_file(t)


def test_chunk_file_docx(tmp_path):
    """A minimal hand-built OOXML docx round-trips through _read_docx:
    paragraphs extracted in order, tabs/breaks become spaces."""
    import zipfile

    ns = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc_xml = (
        f'<?xml version="1.0"?><w:document xmlns:w="{ns}"><w:body>'
        '<w:p><w:r><w:t>First paragraph about the album.</w:t></w:r></w:p>'
        '<w:p><w:r><w:t>Second</w:t></w:r><w:r><w:tab/></w:r>'
        '<w:r><w:t>paragraph with a tab and enough words here.</w:t></w:r></w:p>'
        '<w:p><w:r><w:t xml:space="preserve"> </w:t></w:r></w:p>'  # blank: dropped
        '</w:body></w:document>')
    p = tmp_path / "doc.docx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("word/document.xml", doc_xml)
        zf.writestr("[Content_Types].xml", "<Types/>")
    chunks = DocumentChunker().chunk_file(p)
    assert chunks, "docx produced no chunks"
    joined = " ".join(c["text"] for c in chunks)
    assert "First paragraph about the album." in joined
    assert "Second paragraph with a tab" in joined
    assert {c["paragraph_idx"] for c in chunks} == {0, 1}


def test_clustering_pools(notes):
    emb = HashEmbedder(dim=64).encode([n["content"] for n in notes])
    tc = TopicClustering(n_clusters=4)
    out = tc.cluster_notes(notes, emb)
    assert out["n_clusters"] == 4
    assert len(out["labels"]) == len(notes)
    total = sum(p["size"] for p in out["topic_pools"])
    assert total == len(notes)
    assert all(p["keywords"] for p in out["topic_pools"])


def test_incremental_plan(tmp_path):
    f1 = tmp_path / "a.txt"
    f1.write_text("one")
    inc = IncrementalProcessor(tmp_path / "cache")
    plan = inc.get_processing_plan([f1])
    assert plan["to_process"] == [str(f1)]
    inc.commit(plan["_hashes"])
    plan2 = inc.get_processing_plan([f1])
    assert plan2["to_process"] == [] and plan2["skip"] == [str(f1)]
    f1.write_text("changed")
    plan3 = inc.get_processing_plan([f1])
    assert plan3["to_process"] == [str(f1)]


def test_incremental_dependency_propagation(tmp_path):
    """A change to a file re-plans its transitive dependents, in
    dependency-first topological order (ref incremental_processor.py:
    123-304)."""
    a, b, c, d = [tmp_path / n for n in ("a.txt", "b.txt", "c.txt", "d.txt")]
    for f in (a, b, c, d):
        f.write_text(f.name)
    inc = IncrementalProcessor(tmp_path / "cache")
    # b depends on a; c depends on b (transitive); d independent
    inc.add_dependency(b, [a])
    inc.add_dependency(c, [b])
    plan = inc.get_processing_plan([a, b, c, d])
    inc.commit(plan["_hashes"])
    assert inc.get_processing_plan([a, b, c, d])["can_skip_processing"]

    a.write_text("changed")
    plan = inc.get_processing_plan([a, b, c, d])
    # direct change + transitive dependents, dependencies first
    assert plan["to_process"] == [str(a), str(b), str(c)]
    assert set(plan["dependents"]) == {str(b), str(c)}
    assert plan["skip"] == [str(d)]
    assert not plan["can_skip_processing"]


def test_incremental_result_cache_and_repair(tmp_path):
    """Per-file result cache + integrity validation/repair: vanished files
    drop out, stale hashes refresh, broken dep edges prune, orphaned
    results clear (ref incremental_processor.py:304-368)."""
    a, b = tmp_path / "a.txt", tmp_path / "b.txt"
    a.write_text("a")
    b.write_text("b")
    inc = IncrementalProcessor(tmp_path / "cache")
    inc.add_dependency(b, [a])
    inc.update_file_cache(a, {"notes": 3})
    inc.update_file_cache(b, {"notes": 5})
    assert inc.get_cached_result(a) == {"notes": 3}

    # reload from disk: state survives
    inc2 = IncrementalProcessor(tmp_path / "cache")
    assert inc2.get_cached_result(b) == {"notes": 5}
    assert inc2.validate_cache_integrity()["ok"]

    # stale hash + vanished dependency + orphaned result
    a.write_text("mutated")
    v = inc2.validate_cache_integrity()
    assert v["hash_mismatches"] == [str(a)]
    inc2._results["ghost.txt"] = {"x": 1}
    b_path = str(b)
    b.unlink()
    v = inc2.validate_cache_integrity()
    assert str(b_path) in v["missing_files"]
    assert "ghost.txt" in v["orphaned_cache_entries"]
    inc2.repair_cache(v)
    v2 = inc2.validate_cache_integrity()
    assert v2["ok"], v2
    assert inc2.get_cached_result(b) is None       # dropped with the file
    stats = inc2.get_cache_statistics()
    assert stats["total_cached_files"] == 1        # only a remains


def test_incremental_topo_order_cycle_safe(tmp_path):
    f1, f2 = tmp_path / "x.txt", tmp_path / "y.txt"
    f1.write_text("x")
    f2.write_text("y")
    inc = IncrementalProcessor(tmp_path / "cache")
    inc.add_dependency(f1, [f2])
    inc.add_dependency(f2, [f1])      # malformed cycle must not hang/fail
    order = inc.optimize_processing_order([str(f1), str(f2)])
    assert sorted(order) == sorted([str(f1), str(f2)])


def test_consistency_checker(notes):
    emb = np.zeros((len(notes), 8), np.float32)
    ck = ConsistencyChecker()
    report = ck.check_consistency(notes, emb, {"nodes": [{"id": n["note_id"]} for n in notes],
                                               "links": []})
    assert report["consistent"], report["issues"]
    bad = ck.check_consistency(notes, emb[:3])
    assert not bad["consistent"]


def _cfg():
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 64)
    loader.set("clustering.n_clusters", 2)
    return loader


def test_document_processor_end_to_end(tmp_path):
    cfg = _cfg()
    dp = DocumentProcessor(tmp_path / "out", llm=None, cfg=cfg,
                           embedding_manager=EmbeddingManager(cfg=cfg, singleton=False))
    result = dp.process_documents(documents=[DOC, MUSIQUE_DOC])
    assert result["atomic_notes"]
    assert result["consistency"]["consistent"], result["consistency"]["issues"]
    assert (tmp_path / "out" / "chunks.jsonl").exists()
    assert (tmp_path / "out" / "atomic_notes.json").exists()
    assert (tmp_path / "out" / "embeddings.npy").exists()
    assert (tmp_path / "out" / "clustering.json").exists()
    assert (tmp_path / "out" / "graph.json").exists()
    assert (tmp_path / "out" / "graph.graphml").exists()
    assert (tmp_path / "out" / "result.json").exists()
    # all notes carry the schema contract
    n = result["atomic_notes"][0]
    for field in ("note_id", "doc_id", "content", "raw_span", "entities",
                  "paragraph_idxs", "retrieval_method", "hop_no"):
        assert field in n


def test_document_processor_caching(tmp_path):
    cfg = _cfg()
    em = EmbeddingManager(cfg=cfg, singleton=False)
    dp = DocumentProcessor(tmp_path / "out", cfg=cfg, embedding_manager=em)
    r1 = dp.process_documents(documents=[DOC])
    t1 = r1["processing_stats"]["elapsed_s"]
    dp2 = DocumentProcessor(tmp_path / "out", cfg=cfg, embedding_manager=em)
    r2 = dp2.process_documents(documents=[DOC])
    assert len(r2["atomic_notes"]) == len(r1["atomic_notes"])
    # second run is pure cache hits (no rebuild of chunks/notes)
    assert r2["processing_stats"]["n_chunks"] == r1["processing_stats"]["n_chunks"]


def test_notes_llm_use_llm_toggle_forces_rule_notes():
    """notes_llm.use_llm=false builds a rule-note KB even with an LLM
    configured (the LLM still serves the answer path)."""
    from anorag_tpu.config import ConfigLoader
    from anorag_tpu.doc.processor import DocumentProcessor, _RuleNoteGenerator

    cfg = ConfigLoader(auto_load=False)
    cfg.set("notes_llm.use_llm", False)

    class _FakeLLM:
        def generate(self, *a, **k):
            raise AssertionError("LLM must not be called for notes")

    dp = DocumentProcessor("/tmp/unused_wd", llm=_FakeLLM(), cfg=cfg)
    assert isinstance(dp.note_generator, _RuleNoteGenerator)
