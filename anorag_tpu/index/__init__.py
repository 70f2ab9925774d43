from anorag_tpu.index.bm25_index import BM25Index, FieldWeightedBM25Index
from anorag_tpu.index.embedding_strategy import EmbeddingConfig, IndexVersionRegistry
from anorag_tpu.index.entity_index import EntityInvertedIndex
from anorag_tpu.index.store import ArtifactStore
from anorag_tpu.index.vector_index import VectorIndex

__all__ = ["BM25Index", "FieldWeightedBM25Index", "EmbeddingConfig",
           "IndexVersionRegistry", "EntityInvertedIndex", "ArtifactStore",
           "VectorIndex"]
