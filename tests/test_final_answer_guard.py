"""Final-answer generator, dataset guard, optimized multi-model client."""
import json

import pytest

from anorag_tpu.answer.final_answer import build_numbered_context, generate_final_answer
from anorag_tpu.llm.clients import OllamaClient
from anorag_tpu.llm.optimized_client import OptimizedMultiModelClient, debug_endpoints
from anorag_tpu.utils.dataset_guard import (
    assert_single_namespace, filter_notes_by_namespace, note_namespace,
)

NOTES = [
    {"note_id": "n1", "title": "Aurora Lane", "paragraph_idxs": [1],
     "raw_span": "Aurora Lane's spouse is Chris Reed.", "content": "x"},
    {"note_id": "n2", "title": "Blue Horizon", "paragraph_idxs": [0],
     "raw_span": "Blue Horizon is performed by Aurora Lane.", "content": "y"},
]


class SpanLLM:
    def generate(self, prompt, system_prompt=None, task_type=None, **kw):
        return json.dumps({
            "answer": "Chris Reed",
            "evidence_spans": ["Aurora Lane's spouse is Chris Reed."],
            "support_idxs": [1],
        })


class BadLLM:
    def __init__(self):
        self.calls = 0

    def generate(self, prompt, system_prompt=None, task_type=None, **kw):
        self.calls += 1
        if self.calls == 1:
            return "not json {{{"
        return json.dumps({"answer": "Chris Reed",
                           "evidence_spans": ["Aurora Lane's spouse is Chris Reed."]})


def test_numbered_context():
    ctx, idxs = build_numbered_context(NOTES)
    assert "[P1]" in ctx and "[P0]" in ctx
    assert idxs == [1, 0]


def test_generate_final_answer_valid():
    out = generate_final_answer(SpanLLM(), "Who is the spouse of Aurora Lane?", NOTES)
    assert out["valid"] and out["answer"] == "Chris Reed"
    assert out["support_idxs"] == [1]
    assert not out["insufficient"]


def test_generate_final_answer_retry():
    llm = BadLLM()
    out = generate_final_answer(llm, "q", NOTES, max_retries=1)
    assert llm.calls == 2 and out["valid"]


def test_generate_final_answer_hallucinated_span_forced_insufficient():
    class Hallucinator:
        def generate(self, *a, **kw):
            return json.dumps({"answer": "Wrong", "evidence_spans": ["made up span"]})

    out = generate_final_answer(Hallucinator(), "q", NOTES, max_retries=0)
    assert out["insufficient"] and not out["valid"]


def test_dataset_guard():
    notes = [{"note_id": "a", "namespace": "ds1"},
             {"note_id": "b", "namespace": "ds2"},
             {"note_id": "c"}]
    stats = {}
    kept = filter_notes_by_namespace(notes, "ds1", stage="post_fusion", stats=stats)
    assert [n["note_id"] for n in kept] == ["a", "c"]  # untagged inherits default
    assert stats["post_fusion"] == 1
    with pytest.raises(ValueError):
        filter_notes_by_namespace([{"namespace": "other"}], "ds1", strict=True)
    assert note_namespace({"dataset": "x"}) == "x"
    assert assert_single_namespace(kept) == "ds1"
    with pytest.raises(AssertionError):
        assert_single_namespace(notes[:2])


def _transport(reply, delay=0.0):
    import time as _t

    def t(url, payload, timeout):
        if delay:
            _t.sleep(delay)
        return {"response": reply}
    return t


def test_optimized_client_cache_and_routing():
    slow = OllamaClient(transport=_transport("slow", delay=0.05))
    fast = OllamaClient(transport=_transport("fast"))
    mm = OptimizedMultiModelClient([slow, fast], cache_ttl=60.0)
    # warm both EMAs
    outs = {mm.generate(f"p{i}") for i in range(6)}
    assert outs <= {"slow", "fast"}
    # cache: identical request returns without another upstream call
    a = mm.generate("same prompt")
    calls_before = slow.stats["calls"] + fast.stats["calls"]
    b = mm.generate("same prompt")
    assert a == b
    assert slow.stats["calls"] + fast.stats["calls"] == calls_before
    # routing should favor the fast endpoint after warm-up
    assert mm._ema[id(fast)] <= mm._ema[id(slow)]


def test_debug_endpoints():
    ok = OllamaClient(transport=_transport("pong"))
    report = debug_endpoints([ok], rounds=2)
    assert report[0]["available"] and len(report[0]["latencies"]) == 2
