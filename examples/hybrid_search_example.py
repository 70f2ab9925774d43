#!/usr/bin/env python
"""Runnable hybrid-search demo on synthetic notes.

Parity target: /root/reference/retrieval/hybrid_search_example.py and
quick_hybrid_test.py — an executable smoke of fusion over inline notes.
Runs on any backend (CPU fine).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from anorag_tpu.config import ConfigLoader
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.retrieval.hybrid import HybridSearcher
from anorag_tpu.retrieval.retriever import VectorRetriever

NOTES = [
    {"note_id": "n1", "doc_id": "d1", "title": "Blue Horizon (album)",
     "content": "Blue Horizon is an album performed by Aurora Lane.",
     "entities": ["Blue Horizon", "Aurora Lane"], "paragraph_idxs": [0]},
    {"note_id": "n2", "doc_id": "d1", "title": "Aurora Lane",
     "content": "Aurora Lane married Chris Reed in 2003.",
     "entities": ["Aurora Lane", "Chris Reed"], "paragraph_idxs": [1]},
    {"note_id": "n3", "doc_id": "d2", "title": "Silent River (film)",
     "content": "Marcus Webb directed Silent River.",
     "entities": ["Marcus Webb", "Silent River"], "paragraph_idxs": [2]},
    {"note_id": "n4", "doc_id": "d3", "title": "Nexus Labs",
     "content": "David Kim founded Nexus Labs in Boston.",
     "entities": ["David Kim", "Nexus Labs"], "paragraph_idxs": [3]},
]


def main() -> int:
    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 256)
    em = EmbeddingManager(cfg=cfg, singleton=False)
    vr = VectorRetriever(embedding_manager=em, index_type="Flat",
                         similarity_threshold=0.0)
    vr.build_index(NOTES)

    query = "Who is the spouse of the performer of Blue Horizon?"
    print(f"query: {query}\n")

    print("== one-pass device hybrid (candidate-union fusion) ==")
    for note in vr.hybrid_search([query], top_k=3)[0]:
        print(f"  {note['final_score']:.3f}  {note['note_id']}  {note['content']}")

    print("\n== HybridSearcher.fuse over separate score lists ==")
    dense_list = [(m["note_id"], m["final_score"]) for m in vr.search([query], top_k=4, threshold=-1)[0]]
    bm25_scores = vr._lexical.scores([query])[0]
    bm25_list = [(NOTES[i]["note_id"], float(s)) for i, s in enumerate(bm25_scores)]
    hs = HybridSearcher(cfg)
    for row in hs.fuse(dense=dense_list, bm25=bm25_list)[:3]:
        print(f"  {row['final_similarity']:.3f}  {row['note_id']}  "
              f"(dense {row['scores']['dense']}, bm25 {row['scores']['bm25']:.3f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
