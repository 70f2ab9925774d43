"""ParallelInterface task processors and per-run storage rewiring."""
import json

import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.parallel.interface import create_parallel_interface
from anorag_tpu.query.processor import QueryProcessor
from anorag_tpu.utils.file_io import next_work_dir, rewire_storage

from conftest import make_notes


def _cfg():
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 64)
    loader.set("vector_store.index_type", "Flat")
    loader.set("clustering.n_clusters", 2)
    return loader


def test_document_interface_end_to_end(tmp_path):
    doc = {"id": "d1", "title": "T",
           "text": "Aurora Lane released Blue Horizon. The album sold well."}
    f = tmp_path / "docs.jsonl"
    f.write_text(json.dumps(doc) + "\n")
    cfg = _cfg()
    iface = create_parallel_interface(
        mode="document", work_dir=tmp_path / "out", cfg=cfg,
        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False), workers=2,
    )
    out = iface.process_documents([str(f)])
    assert not out["errors"]
    assert out["results"]["atomic_notes"]
    assert out["stats"].tasks_done == 1


def test_query_interface(tmp_path):
    cfg = _cfg()
    qp = QueryProcessor(make_notes(8), cfg=cfg,
                        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False))
    iface = create_parallel_interface(mode="query", query_processor=qp, workers=2)
    res = iface.process_queries([
        "Who is Aurora Lane?",
        {"query": "Quantum Leap Institute", "qid": "q2"},
    ])
    assert len(res) == 2
    assert all("answer" in r for r in res)


def test_musique_interface(tmp_path):
    cfg = _cfg()
    item = {"id": "x", "question": "Who founded Nexus Labs?",
            "paragraphs": [{"idx": 0, "title": "Nexus Labs",
                            "paragraph_text": "Nexus Labs was founded by David Kim."}]}
    iface = create_parallel_interface(
        mode="musique", work_dir=tmp_path, cfg=cfg,
        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False), workers=1,
    )
    rows = iface.process_musique_dataset([item])
    assert rows[0]["id"] == "x"
    assert rows[0]["predicted_answer"]


def test_storage_rewiring(tmp_path):
    cfg = _cfg()
    cfg.set("storage.result_root", str(tmp_path / "result"))
    work = next_work_dir(cfg.get("storage.result_root"))
    rewire_storage(cfg, work)
    assert cfg.get("storage.work_dir") == str(work)
    assert cfg.get("storage.vector_index_path").startswith(str(work))
    work2 = next_work_dir(cfg.get("storage.result_root"))
    assert work2.name == str(int(work.name) + 1)
