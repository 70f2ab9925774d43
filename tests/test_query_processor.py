"""QueryProcessor: end-to-end online pipeline with hash embeddings and a
mock LLM; stage-level behavior checks."""
import json

import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.query.processor import QueryProcessor, filter_notes_by_namespace
from anorag_tpu.query.subquestion import SubQuestionPlanner
from anorag_tpu.query.evidence_merger import EvidenceMerger


def _cfg(**overrides):
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 128)
    loader.set("vector_store.index_type", "Flat")
    loader.set("vector_store.top_k", 10)
    loader.set("hybrid_search.lexical_fallback.noise_threshold", 0.0)
    for k, v in overrides.items():
        loader.set(k, v)
    return loader


def _kb_notes():
    """Multi-hop KB: Blue Horizon -> Aurora Lane -> Chris Reed."""
    rows = [
        ("n1", "Blue Horizon (album)", "Blue Horizon is performed by Aurora Lane.",
         ["Blue Horizon", "Aurora Lane"], 0,
         {"head_key": "Blue Horizon", "rel": "performed_by", "tail_key": "Aurora Lane"}),
        ("n2", "Aurora Lane", "Aurora Lane's spouse is Chris Reed.",
         ["Aurora Lane", "Chris Reed"], 1,
         {"head_key": "Aurora Lane", "rel": "spouse_of", "tail_key": "Chris Reed"}),
        ("n3", "Aurora Lane", "Aurora Lane was born in Boston.",
         ["Aurora Lane", "Boston"], 2, {}),
        ("n4", "Silent River (film)", "Marcus Webb directed Silent River.",
         ["Marcus Webb", "Silent River"], 3, {}),
        ("n5", "Nexus Labs", "David Kim founded Nexus Labs in 2010.",
         ["David Kim", "Nexus Labs"], 4, {}),
        ("n6", "Quantum Leap Institute", "Elena Cortez leads the Quantum Leap Institute.",
         ["Elena Cortez", "Quantum Leap Institute"], 5, {}),
    ]
    notes = []
    for nid, title, content, ents, pidx, extra in rows:
        notes.append({
            "note_id": nid, "doc_id": f"doc_{pidx}", "title": title,
            "content": content, "text": content, "raw_span": content,
            "entities": ents, "paragraph_idxs": [pidx], **extra,
        })
    return notes


class MockLLM:
    """Returns an evidence-first JSON answer naming Chris Reed."""

    def __init__(self, answer="Chris Reed"):
        self.answer = answer
        self.calls = []

    def generate(self, prompt, system_prompt=None, task_type=None, **kw):
        self.calls.append({"prompt": prompt, "task_type": task_type})
        # quote a verbatim span from the packed context
        span = None
        for line in prompt.splitlines():
            if self.answer in line:
                span = line.split("] ", 1)[-1].strip()
                break
        return json.dumps({
            "answer": self.answer,
            "evidence_spans": [span] if span else [],
            "support_idxs": [1],
            "insufficient": span is None,
        })


@pytest.fixture(scope="module")
def qp():
    return QueryProcessor(_kb_notes(), cfg=_cfg(), llm=None)


def test_process_returns_contract(qp):
    res = qp.process("Who is the spouse of the performer of Blue Horizon?")
    for key in ("answer", "predicted_answer", "predicted_support_idxs",
                "predicted_answerable", "notes", "candidate_notes"):
        assert key in res
    assert res["answer"] == "Chris Reed"     # relation-chain selector resolves it
    assert res["answer_method"] == "answer_selector"
    assert res["predicted_support_idxs"]


def test_efsa_path_without_selector():
    cfg = _cfg()
    cfg.set("answer_selector.enabled", False)
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=None)
    res = qp.process("Who directed Silent River?")
    assert res["answer_method"] == "efsa"
    assert "Marcus Webb" in res["answer"] or "Silent River" in res["answer"]


def test_llm_answer_path_with_validation():
    cfg = _cfg()
    cfg.set("answer_selector.enabled", False)
    llm = MockLLM("Chris Reed")
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=llm)
    res = qp.process("Who is the spouse of Aurora Lane?")
    assert res["answer"] == "Chris Reed"
    assert res["answer_method"] == "llm"
    assert any(c["task_type"] == "final_answer" for c in llm.calls)
    assert res["predicted_support_idxs"]


def test_dense_recall_ranks_relevant_first(qp):
    res = qp.process("Who founded Nexus Labs?")
    top_ids = [n["note_id"] for n in res["notes"][:3]]
    assert "n5" in top_ids


def test_two_hop_adds_bridge_notes():
    cfg = _cfg()
    cfg.set("answer_selector.enabled", False)
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=None)
    res = qp.process("Who is the spouse of the performer of Blue Horizon?")
    cands = {c["note_id"]: c for c in res["candidate_notes"]}
    # n2 (spouse note) reachable via bridge entity Aurora Lane
    assert "n2" in cands
    hops = {c.get("hop_no", 1) for c in res["candidate_notes"]}
    assert 2 in hops or "Aurora Lane" in res["trace"]["bridge_entities"]


def test_multihop_safety_filter():
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(), llm=None)
    cands = [
        {"note_id": f"x{i}", "final_score": 0.01, "hop_no": 1} for i in range(10)
    ]
    kept = qp._filter_with_multihop_safety(cands)
    # per-hop top-5 keepalive even though all below lower_threshold
    assert len(kept) == qp.per_hop_keep_top_m


def test_cluster_suppression():
    cfg = _cfg()
    cfg.set("safety.cluster.enabled", True)
    cfg.set("safety.cluster.cos_threshold", 0.99)
    cfg.set("safety.cluster.keep_per_cluster", 1)
    notes = _kb_notes()
    # duplicate note content => identical embedding
    dup = dict(notes[0], note_id="n1dup")
    qp = QueryProcessor(notes + [dup], cfg=cfg, llm=None)
    cands = [dict(n, final_score=0.5) for n in qp.notes]
    kept = qp._cluster_suppress(cands)
    ids = {c["note_id"] for c in kept}
    assert not {"n1", "n1dup"} <= ids


def test_cluster_suppression_member_not_owner():
    """Regression (v6 eval, KeyError: 2): a kept cluster MEMBER must not
    own later candidates. With A~B, B~C but A!~C and keep_per_cluster=2,
    C used to pick member B as its owner and crash on the missing count
    entry; now C starts its own cluster."""
    import numpy as np

    cfg = _cfg()
    cfg.set("safety.cluster.enabled", True)
    cfg.set("safety.cluster.cos_threshold", 0.9)
    cfg.set("safety.cluster.keep_per_cluster", 2)
    notes = _kb_notes()[:3]
    qp = QueryProcessor(notes, cfg=cfg, llm=None)
    th = np.deg2rad([0.0, 25.0, 50.0])
    qp.embeddings = np.stack([np.cos(th), np.sin(th)], axis=1)
    cands = [dict(n, final_score=0.5) for n in qp.notes]
    kept = qp._cluster_suppress(cands)   # must not raise
    assert [c["note_id"] for c in kept] == [n["note_id"] for n in notes]


def test_namespace_filter():
    notes = [{"note_id": "a", "namespace": "ds1"}, {"note_id": "b", "namespace": "ds2"}]
    assert [n["note_id"] for n in filter_notes_by_namespace(notes, "ds1")] == ["a"]
    assert len(filter_notes_by_namespace(notes, None)) == 2


def test_final_recall_audit(tmp_path):
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(), llm=None, work_dir=str(tmp_path))
    res = qp.process("Who founded Nexus Labs?", qid="q1")
    assert (tmp_path / "final_recall.jsonl").exists()
    assert res["trace"]["final_recall_sha1"]


def test_subquestion_decomposition_path():
    cfg = _cfg()
    cfg.set("query.use_subquestion_decomposition", True)
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=None)
    res = qp.process("Who directed Silent River and who founded Nexus Labs?")
    assert len(res["sub_questions"]) >= 2
    ids = {n["note_id"] for n in res["notes"]}
    assert "n4" in ids and "n5" in ids
    assert res["merge_stats"]["n_subquestions"] >= 2


def test_subquestion_planner_llm_and_fallback():
    class SubqLLM:
        def generate(self, prompt, system_prompt=None, task_type=None, **kw):
            return '{"sub_questions": ["Who directed Silent River?", "Who founded Nexus Labs?"]}'

    p = SubQuestionPlanner(SubqLLM(), min_complexity=0.0)
    subs = p.plan("Who directed Silent River and who founded Nexus Labs?")
    assert len(subs) == 2
    p2 = SubQuestionPlanner(None, min_complexity=99.0)
    assert p2.plan("simple?") == ["simple?"]


def test_evidence_merger_dedup_and_provenance():
    em = EvidenceMerger(strategy="weighted")
    merged = em.merge_evidence({
        "sq1": [{"note_id": "a", "final_score": 0.5}],
        "sq2": [{"note_id": "a", "final_score": 0.4}, {"note_id": "b", "final_score": 0.3}],
    })
    assert len(merged) == 2
    a = next(m for m in merged if m["note_id"] == "a")
    assert a["final_score"] == pytest.approx(0.5 + 0.2)
    assert em.last_stats["n_duplicates"] == 1


def test_process_batch_fast_path():
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(), llm=None)
    res = qp.process_batch([
        "Who is the spouse of the performer of Blue Horizon?",
        "Who founded Nexus Labs?",
    ])
    assert len(res) == 2
    assert res[0]["answer"] == "Chris Reed"
    assert res[1]["answer"] == "David Kim"
    assert all(r["predicted_support_idxs"] for r in res)


def test_process_stream_matches_process_batch():
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(), llm=None)
    queries = ["Who is the spouse of the performer of Blue Horizon?",
               "Who founded Nexus Labs?",
               "Who directed Silent River?"]
    batch_res = qp.process_batch(queries[:2]) + qp.process_batch(queries[2:])
    stream_res = [r for out in qp.process_stream([queries[:2], queries[2:]])
                  for r in out]
    assert [r["answer"] for r in stream_res] == [r["answer"] for r in batch_res]
    assert [r["predicted_support_idxs"] for r in stream_res] == \
           [r["predicted_support_idxs"] for r in batch_res]


def test_unanswerable_gate():
    """Questions about entities absent from the whole evidence pool return
    predicted_answerable=False instead of a hallucinated distractor;
    questions whose subject IS covered stay answerable (v2 eval: the gate
    took answerable accuracy 0.875 -> 0.995 at unchanged answer EM)."""
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(),
                        embedding_manager=EmbeddingManager(cfg=_cfg(), singleton=False))
    res = qp.process("Who is the spouse of the performer of Ghostly Meridian?")
    assert res["predicted_answerable"] is False
    assert res["answer_method"] == "unanswerable_gate"
    assert "insufficient" in res["answer"].lower()
    # covered subject: answers normally
    res2 = qp.process("Who is the spouse of the performer of Blue Horizon?")
    assert res2["predicted_answerable"] is True
    assert res2["answer"] == "Chris Reed"
    # a shared suffix word alone must not count as coverage
    res3 = qp.process("Who is the spouse of the performer of Ghostly Horizon?")
    assert res3["predicted_answerable"] is False
    # gate off: old behavior (always answers)
    qp2 = QueryProcessor(_kb_notes(), cfg=_cfg(**{"answering.unanswerable_gate": False}),
                         embedding_manager=EmbeddingManager(cfg=_cfg(), singleton=False))
    res4 = qp2.process("Who is the spouse of the performer of Ghostly Meridian?")
    assert res4["answer_method"] != "unanswerable_gate"
