from anorag_tpu.query.evidence_merger import EvidenceMerger
from anorag_tpu.query.processor import QueryProcessor
from anorag_tpu.query.subquestion import SubQuestionPlanner

__all__ = ["EvidenceMerger", "QueryProcessor", "SubQuestionPlanner"]
