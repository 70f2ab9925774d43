"""Root-level shim for the relation-chain answer selector.

Parity target: the reference's root answer_selector.py (a 30-LoC re-export
of pipeline/answer_selector). The implementation lives in
anorag_tpu.answer.answer_selector.
"""
from anorag_tpu.answer.answer_selector import answer_question, extract_rel_chain

__all__ = ["answer_question", "extract_rel_chain"]
