"""Note-quality post-passes (llm/note_quality.py): related-note linking,
usefulness/noise filtering, and source-coverage evaluation (parity:
utils/note_similarity.py, utils/enhanced_noise_filter.py,
utils/note_coverage_eval.py:46)."""
import json

import numpy as np

from anorag_tpu.llm.note_quality import (
    EnhancedNoiseFilter,
    NoteSimilarityCalculator,
    evaluate_note_coverage,
)


def _note(i, content, entities=(), **kw):
    return {"note_id": f"n{i}", "content": content,
            "entities": list(entities), **kw}


# ----------------------------------------------------------- related notes
def test_related_notes_links_similar_pairs():
    notes = [
        _note(0, "Aurora Lane created Blue Horizon in 1990.",
              ["Aurora Lane", "Blue Horizon"]),
        _note(1, "Blue Horizon was created by Aurora Lane.",
              ["Aurora Lane", "Blue Horizon"]),
        _note(2, "Quantum physics studies subatomic particles.",
              ["Quantum"]),
    ]
    out = NoteSimilarityCalculator(similarity_threshold=0.5).find_related_notes(notes)
    ids0 = [r["note_id"] for r in out[0]["related_notes"]]
    assert "n1" in ids0
    assert all(r["note_id"] != "n2" for r in out[0]["related_notes"])
    # symmetric content: n1 links back to n0 with shared entities recorded
    rel10 = [r for r in out[1]["related_notes"] if r["note_id"] == "n0"]
    assert rel10 and "aurora lane" in rel10[0]["shared_entities"]
    # unrelated note ends up with no (or weaker, thresholded-out) links to 0/1
    assert all(r["note_id"] not in ("n0", "n1") or r["similarity"] < 0.99
               for r in out[2]["related_notes"])


def test_related_notes_cap_and_singleton():
    base = "Aurora Lane created Blue Horizon."
    notes = [_note(i, base, ["Aurora Lane"]) for i in range(9)]
    out = NoteSimilarityCalculator(similarity_threshold=0.3,
                                   max_related_notes=3).find_related_notes(notes)
    assert all(len(n["related_notes"]) == 3 for n in out)
    single = NoteSimilarityCalculator().find_related_notes([_note(0, base)])
    assert single[0]["related_notes"] == []


# ------------------------------------------------------------ noise filter
def test_noise_filter_patterns_and_usefulness():
    nf = EnhancedNoiseFilter(usefulness_threshold=0.5)
    assert nf.is_noise(_note(0, "   "))
    assert nf.is_noise(_note(1, "..."))
    assert nf.is_noise(_note(2, "12345"))
    assert nf.is_noise(_note(3, "short"))
    good = _note(4, "Aurora Lane founded Blue Horizon Records in 1990.",
                 ["Aurora Lane", "Blue Horizon Records"],
                 importance_score=0.8)
    assert not nf.is_noise(good)
    assert nf.usefulness_score(good) > 0.7   # verified entities + cue bonus
    bad = _note(5, "This text mentions nothing that its entity list claims.",
                ["Zanzibar Fruitbat"], importance_score=0.1)
    assert nf.usefulness_score(bad) < nf.usefulness_score(good)
    kept, dropped = nf.filter_notes([good, bad, _note(6, "...")])
    assert good in kept and len(dropped) == 2


# --------------------------------------------------------------- coverage
def test_note_coverage_report(tmp_path):
    chunks = [
        {"chunk_index": 0,
         "text": ("Aurora Lane created the famous album Blue Horizon. "
                  "The album sold two million copies worldwide after release.")},
        {"chunk_index": 1,
         "text": "Marcus Webb directed the movie Silent River in Montana."},
    ]
    notes = [
        {"note_id": "a", "chunk_index": 0,
         "content": "Aurora Lane created the famous album Blue Horizon.",
         "raw_span": "Aurora Lane created the famous album Blue Horizon."},
        # nothing covers chunk 0's second sentence or chunk 1
    ]
    rp, mp = tmp_path / "cov.json", tmp_path / "missing.jsonl"
    res = evaluate_note_coverage(chunks, notes, threshold=0.6,
                                 min_sentence_tokens=4,
                                 report_path=str(rp), missing_path=str(mp))
    by_chunk = {c["chunk_index"]: c for c in res["per_chunk"]}
    assert by_chunk[0]["coverage"] == 0.5
    assert by_chunk[1]["coverage"] == 0.0
    assert 1 in res["critical_chunks"]
    assert res["n_missing"] == 2
    assert json.loads(rp.read_text())["mean_coverage"] == res["mean_coverage"]
    assert len(mp.read_text().strip().splitlines()) == 2


def test_coverage_wired_into_generator(tmp_path, fresh_config):
    from anorag_tpu.llm.note_generator import AtomicNoteGenerator

    fresh_config.set("evaluation.coverage.enabled", True)
    fresh_config.set("evaluation.coverage.min_sentence_tokens", 4)
    fresh_config.set("evaluation.coverage.report_path", str(tmp_path / "r.json"))
    fresh_config.set("evaluation.coverage.missing_sentences_path",
                     str(tmp_path / "m.jsonl"))
    gen = AtomicNoteGenerator(llm=None, cfg=fresh_config)  # rule fallback
    chunks = [{"doc_id": "d0", "chunk_index": 0,
               "text": "Aurora Lane created the famous album Blue Horizon."}]
    notes = gen.generate_atomic_notes(chunks)
    assert notes
    assert "coverage_mean_pct" in gen.stats
    assert (tmp_path / "r.json").exists()
