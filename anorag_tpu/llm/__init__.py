from anorag_tpu.llm.clients import LMStudioClient, OllamaClient, OpenAIClient
from anorag_tpu.llm.factory import LLMFactory
from anorag_tpu.llm.local_llm import LocalLLM
from anorag_tpu.llm.multi_model import HybridLLMDispatcher, MultiModelClient, TaskClassifier
from anorag_tpu.llm.note_generator import AtomicNoteGenerator

__all__ = ["LMStudioClient", "OllamaClient", "OpenAIClient", "LLMFactory",
           "LocalLLM", "HybridLLMDispatcher", "MultiModelClient",
           "TaskClassifier", "AtomicNoteGenerator"]
