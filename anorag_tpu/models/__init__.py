from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.models.hash_embedder import HashEmbedder
from anorag_tpu.models.tokenizer import HashTokenizer, get_tokenizer

__all__ = ["EmbeddingManager", "HashEmbedder", "HashTokenizer", "get_tokenizer"]
