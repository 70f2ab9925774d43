from anorag_tpu.doc.chunker import DocumentChunker
from anorag_tpu.doc.clustering import TopicClustering
from anorag_tpu.doc.consistency import ConsistencyChecker
from anorag_tpu.doc.incremental import IncrementalProcessor
from anorag_tpu.doc.processor import DocumentProcessor

__all__ = ["DocumentChunker", "TopicClustering", "ConsistencyChecker",
           "IncrementalProcessor", "DocumentProcessor"]
