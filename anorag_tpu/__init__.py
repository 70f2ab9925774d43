"""anorag_tpu — a TPU-native atomic-note retrieval-augmented-generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of AnoRAG
(reference: Kevinwu901113/ano-rag): documents are chunked, converted into
atomic notes, embedded with a pjit-sharded JAX encoder, indexed into
HBM-resident dense (flat + IVF) and sparse (BM25 CSR) structures searched by
fused Pallas matmul+top-k kernels, linked into a CSR knowledge graph with
on-device PageRank / k-hop expansion, and queried through hybrid fusion,
multi-hop bridge-entity expansion, context scheduling, and EFSA / LLM answer
generation.

Layer map (mirrors SURVEY.md §1):
  config/     YAML config system with defaults skeleton, aliases, dot-paths
  utils/      text/file/json/logging/NER foundations
  ops/        Pallas kernels + JAX device ops (top-k, IVF, BM25, k-means,
              fusion, graph, segment reductions)
  parallel/   device mesh + sharded search collectives; task-parallel engine
  models/     JAX encoder (dp x tp sharded), tokenizer, contrastive training
  index/      vector index (flat/IVF), BM25 index, entity inverted index,
              artifact store
  graph/      relation extraction, CSR graph index, retrievers, beam search
  retrieval/  hybrid fusion, path-aware ranker, guardrail, diversity,
              learned fusion, query planner, recall optimizer
  context/    dispatcher, scheduler, packer, structure packing
  answer/     EFSA, span picker, verifier, evidence rerank, validators
  llm/        provider clients, dispatcher, atomic-note generation, prompts
  doc/        chunker, clustering, incremental cache, DocumentProcessor
  query/      QueryProcessor, sub-question planning, evidence merging
  eval/       MuSiQue metrics + enhanced evaluator
"""

__version__ = "0.3.3"

from anorag_tpu.config import config  # noqa: F401
