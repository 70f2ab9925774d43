"""Coverage for the final-answer validator, prompt builders, and the
structured logging utilities (previously only exercised indirectly).

Parity targets: /root/reference/validators/final_answer_validator.py:11-80,
/root/reference/llm/prompts/{atomic_note,final_answer}.py,
/root/reference/utils/logging_utils.py:12-223.
"""
import json
import logging

import pytest

from anorag_tpu.llm.prompts import (
    ATOMIC_NOTE_SENTINEL, build_atomic_note_prompt, build_final_answer_prompt,
    FINAL_ANSWER_SYSTEM,
)
from anorag_tpu.utils.logging import StructuredLogger, get_logger, log_performance
from anorag_tpu.validators.final_answer_validator import validate_final_answer

CTX = "[P0] Aurora Lane's spouse is Chris Reed.\n[P1] Blue Horizon is performed by Aurora Lane."


def test_validator_accepts_supported_answer():
    ok, issues, norm = validate_final_answer(
        {"answer": "Chris Reed",
         "evidence_spans": ["Aurora Lane's spouse is Chris Reed."]}, CTX)
    assert ok and not issues
    assert norm["answer"] == "Chris Reed"
    assert norm["evidence_spans"] == ["Aurora Lane's spouse is Chris Reed."]


def test_validator_rejects_non_verbatim_span():
    ok, issues, norm = validate_final_answer(
        {"answer": "Chris Reed", "evidence_spans": ["Chris Reed is married"]}, CTX)
    assert not ok
    assert any("not verbatim" in i for i in issues)
    # with no verbatim spans the result is forced insufficient
    assert norm["insufficient"] is True


def test_validator_rejects_unsupported_answer():
    ok, issues, _ = validate_final_answer(
        {"answer": "Marcus Webb",
         "evidence_spans": ["Aurora Lane's spouse is Chris Reed."]}, CTX)
    assert not ok
    assert any("not supported" in i for i in issues)


def test_validator_non_dict_and_missing_answer():
    ok, issues, norm = validate_final_answer("just text", CTX)
    assert not ok and norm["insufficient"] is True
    ok2, issues2, _ = validate_final_answer({"evidence_spans": []}, CTX)
    assert not ok2
    assert any("missing answer" in i for i in issues2)


def test_validator_insufficient_passes_without_spans():
    ok, issues, norm = validate_final_answer(
        {"answer": "insufficient information", "evidence_spans": [],
         "insufficient": True}, CTX)
    assert ok, issues
    assert norm["insufficient"] is True


def test_atomic_note_prompt_contract():
    p = build_atomic_note_prompt("chunk", ["First sentence.", "Second one."],
                                 entity_cards=["Aurora Lane (person)"])
    assert "[0] First sentence." in p and "[1] Second one." in p
    assert "Aurora Lane (person)" in p
    # the early-stop sentinel must be a single char the streamer can match
    assert len(ATOMIC_NOTE_SENTINEL) == 1


def test_final_answer_prompt_hint_and_discipline():
    p = build_final_answer_prompt("Who?", CTX, efsa_hint="Chris Reed")
    assert "Chris Reed" in p and "Who?" in p
    p2 = build_final_answer_prompt("Who?", CTX)
    assert "Chris Reed" not in p2.replace(CTX, "")
    # evidence-first discipline lives in the system prompt
    assert "context" in FINAL_ANSWER_SYSTEM.lower()


def test_structured_logger_emits_json_fields(caplog):
    sl = StructuredLogger("anorag.test_metrics")
    with caplog.at_level(logging.INFO, logger="anorag.test_metrics"):
        sl.log_retrieval_metrics(qid="q1", n_dense=5)
    payload = json.loads(caplog.records[-1].getMessage())
    assert payload["qid"] == "q1" and payload["n_dense"] == 5
    assert payload["event"] == "retrieval_metrics"


def test_log_performance_records_and_passes_through(caplog):
    @log_performance
    def work(x):
        return x * 2

    with caplog.at_level(logging.DEBUG):
        assert work(21) == 42
