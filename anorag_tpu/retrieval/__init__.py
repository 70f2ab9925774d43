from anorag_tpu.retrieval.diversity import DiversityScheduler
from anorag_tpu.retrieval.guardrail import RetrievalGuardrail
from anorag_tpu.retrieval.hybrid import HybridSearcher, create_hybrid_searcher
from anorag_tpu.retrieval.learned_fusion import LearnedFusion
from anorag_tpu.retrieval.path_aware_ranker import PathAwareRanker
from anorag_tpu.retrieval.query_planner import LLMBasedRewriter, QueryPlanner
from anorag_tpu.retrieval.recall_optimizer import EnhancedRecallOptimizer
from anorag_tpu.retrieval.reranker import ListwiseReranker, fuse_scores
from anorag_tpu.retrieval.retriever import VectorRetriever

__all__ = ["DiversityScheduler", "RetrievalGuardrail", "HybridSearcher",
           "create_hybrid_searcher", "LearnedFusion", "PathAwareRanker",
           "LLMBasedRewriter", "QueryPlanner", "EnhancedRecallOptimizer",
           "ListwiseReranker", "fuse_scores", "VectorRetriever"]
