from anorag_tpu.answer.answer_selector import answer_question, extract_rel_chain
from anorag_tpu.answer.efsa import efsa_answer, efsa_answer_with_fallback
from anorag_tpu.answer.evidence_rerank import EvidenceReranker
from anorag_tpu.answer.final_answer import generate_final_answer
from anorag_tpu.answer.path_validator import PathValidator
from anorag_tpu.answer.span_picker import SpanPicker
from anorag_tpu.answer.support_fill import fill_support_idxs_noid
from anorag_tpu.answer.verifier import AnswerVerifier

__all__ = ["answer_question", "extract_rel_chain", "efsa_answer",
           "efsa_answer_with_fallback", "EvidenceReranker",
           "generate_final_answer", "PathValidator", "SpanPicker",
           "fill_support_idxs_noid", "AnswerVerifier"]
