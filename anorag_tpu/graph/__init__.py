from anorag_tpu.graph.beam_search import KeyPath, beam_search
from anorag_tpu.graph.builder import GraphBuilder
from anorag_tpu.graph.exporter import export_graphml
from anorag_tpu.graph.graph_index import GraphIndex
from anorag_tpu.graph.graph_retrieval import GraphAwareRetrieval
from anorag_tpu.graph.multi_hop import MultiHopQueryProcessor
from anorag_tpu.graph.note_graph import NoteGraph
from anorag_tpu.graph.quality import compute_metrics
from anorag_tpu.graph.relation_extractor import RelationExtractor
from anorag_tpu.graph.retriever import GraphRetriever

__all__ = ["KeyPath", "beam_search", "GraphBuilder", "export_graphml",
           "GraphIndex", "GraphAwareRetrieval", "MultiHopQueryProcessor",
           "NoteGraph", "compute_metrics", "RelationExtractor", "GraphRetriever"]
