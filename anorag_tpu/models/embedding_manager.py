"""EmbeddingManager: the one entrypoint for turning text into vectors.

Parity with the reference EmbeddingManager
(/root/reference/vector_store/embedding_manager.py): thread-safe singleton,
batched note/query encoding with the `title || content || ENTITIES: ...`
strategy, query prefixing, L2 normalization, numpy similarity helpers, and
model-signature consistency checks. The compute backend differs by design:
  * 'jax'  — the pjit-shardable TPU transformer encoder (random-init unless
             a checkpoint is provided via orbax);
  * 'hash' — the deterministic feature-hash embedder (weight-free).
"""
from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from anorag_tpu.config import config as global_config
from anorag_tpu.utils.logging import get_logger, log_performance
from anorag_tpu.utils.text import note_embedding_text

logger = get_logger("anorag.embedding")


class EmbeddingManager:
    _instance: Optional["EmbeddingManager"] = None
    _lock = threading.Lock()

    def __new__(cls, *args, **kwargs):
        # double-checked singleton, like the reference (:64-127); tests can
        # construct independent instances with singleton=False.
        if kwargs.get("singleton", True):
            if cls._instance is None:
                with cls._lock:
                    if cls._instance is None:
                        inst = super().__new__(cls)
                        inst._initialized = False
                        cls._instance = inst
            return cls._instance
        inst = super().__new__(cls)
        inst._initialized = False
        return inst

    def __init__(self, cfg: Optional[Any] = None, singleton: bool = True):
        if self._initialized:
            return
        self._initialized = True
        self._cfg = cfg or global_config
        emb_cfg = self._cfg.get("embedding", {}) or {}
        self.model_name = emb_cfg.get("model_name", "BAAI/bge-m3")
        self.backend = emb_cfg.get("backend", "jax")
        self.dim = emb_cfg.get("dim", 1024)
        self.batch_size = emb_cfg.get("batch_size", 64)
        self.max_length = emb_cfg.get("max_length", 512)
        self.normalize = emb_cfg.get("normalize", True)
        self.query_prefix = emb_cfg.get("query_prefix", "")
        self.include_entities = emb_cfg.get("include_entities", True)
        self._encoder = None
        self._params = None
        self._tokenizer = None
        self._hash = None
        self._enc_lock = threading.Lock()

    # ----------------------------------------------------------- backends
    def _ensure_backend(self) -> None:
        with self._enc_lock:
            if self.backend == "hash":
                if self._hash is None:
                    from anorag_tpu.models.hash_embedder import HashEmbedder

                    self._hash = HashEmbedder(dim=self.dim)
            else:
                if self._encoder is None:
                    import jax

                    from anorag_tpu.models import encoder as enc
                    from anorag_tpu.models.hf_loader import load_hf_encoder
                    from anorag_tpu.models.tokenizer import get_tokenizer

                    # real checkpoint weights when locally cached (bge-m3 /
                    # any XLM-R/BERT-family model); random init otherwise
                    loaded = load_hf_encoder(
                        self.model_name,
                        dtype=self._cfg.get("encoder.dtype", "bfloat16"),
                    ) if self.model_name else None
                    if loaded is not None:
                        self._params, self._enc_cfg = loaded
                        self.dim = self._enc_cfg.hidden_size
                    else:
                        enc_cfg_dict = dict(self._cfg.get("encoder", {}) or {})
                        enc_cfg_dict.setdefault("hidden_size", self.dim)
                        self._enc_cfg = enc.EncoderConfig.from_config(enc_cfg_dict)
                        self._params = enc.init_params(jax.random.PRNGKey(0), self._enc_cfg)
                    self._tokenizer = get_tokenizer(
                        self.model_name, self._enc_cfg.vocab_size, self.max_length
                    )
                    self._encode_jit = jax.jit(
                        lambda p, ids, mask: enc.encode(p, ids, mask, self._enc_cfg)
                    )
                    self._encoder = enc
                    # in-image trained checkpoint (scripts/
                    # train_retrieval_encoder.py) — auto-loaded from config
                    ckpt = self._cfg.get("embedding.checkpoint_path", "")
                    if ckpt:
                        try:
                            import orbax.checkpoint as ocp
                            from pathlib import Path as _P

                            ckptr = ocp.StandardCheckpointer()
                            self._params = ckptr.restore(
                                _P(ckpt).resolve(), self._params)
                            logger.info("encoder checkpoint loaded: %s", ckpt)
                        except Exception as e:
                            logger.warning("encoder checkpoint load failed: %s", e)

    def load_checkpoint(self, path: str) -> bool:
        """Restore encoder params with orbax (returns False if unavailable)."""
        self._ensure_backend()
        if self.backend == "hash":
            return False
        try:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            self._params = ckptr.restore(path, self._params)
            return True
        except Exception as e:  # pragma: no cover
            logger.warning("checkpoint restore failed: %s", e)
            return False

    # ------------------------------------------------------------ encoding
    @log_performance
    def encode_texts(self, texts: Sequence[str], batch_size: Optional[int] = None) -> np.ndarray:
        """Batched text -> (N, dim) f32 embeddings."""
        if not len(texts):
            return np.zeros((0, self.dim), np.float32)
        self._ensure_backend()
        if self.backend == "hash":
            return self._hash.encode(list(texts), normalize=self.normalize)

        import jax.numpy as jnp

        bs = batch_size or self.batch_size
        outs: List[np.ndarray] = []
        for i in range(0, len(texts), bs):
            batch = list(texts[i : i + bs])
            pad = 0
            if len(batch) < bs and len(texts) > bs:
                pad = bs - len(batch)   # keep shapes static across batches
                batch = batch + [""] * pad
            ids, mask = self._tokenizer.encode_batch(batch, self.max_length)
            emb = np.asarray(self._encode_jit(self._params, jnp.asarray(ids), jnp.asarray(mask)))
            outs.append(emb[: len(batch) - pad] if pad else emb)
        return np.concatenate(outs, axis=0)[: len(texts)]

    def encode_atomic_notes(self, notes: Sequence[Dict[str, Any]]) -> np.ndarray:
        texts = [
            note_embedding_text(n, include_entities=self.include_entities) for n in notes
        ]
        return self.encode_texts(texts)

    def encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        prefixed = [f"{self.query_prefix}{q}" if self.query_prefix else q for q in queries]
        return self.encode_texts(prefixed)

    # --------------------------------------------------------- similarity
    @staticmethod
    def cosine_similarity(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-9)
        return a @ b.T

    @staticmethod
    def top_k_similar(query_emb: np.ndarray, corpus_emb: np.ndarray, k: int = 10,
                      metric: str = "cosine") -> Tuple[np.ndarray, np.ndarray]:
        if metric == "euclidean":
            d = np.linalg.norm(corpus_emb[None, :, :] - query_emb[:, None, :], axis=-1)
            scores = -d
        elif metric == "dot":
            scores = query_emb @ corpus_emb.T
        else:
            scores = EmbeddingManager.cosine_similarity(query_emb, corpus_emb)
        k = min(k, corpus_emb.shape[0])
        idx = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        sc = np.take_along_axis(scores, idx, axis=1)
        order = np.argsort(-sc, axis=1, kind="stable")
        return np.take_along_axis(sc, order, axis=1), np.take_along_axis(idx, order, axis=1)

    # ---------------------------------------------------------- signature
    def model_signature(self) -> Dict[str, Any]:
        """Identity of the embedding space; stored beside index artifacts and
        checked on load (the reference's consistency check, :697-779)."""
        return {
            "model_name": self.model_name,
            "backend": self.backend,
            "dim": self.dim,
            "max_length": self.max_length,
            "normalize": self.normalize,
            "query_prefix": self.query_prefix,
        }

    def check_signature(self, stored: Dict[str, Any]) -> bool:
        return stored == self.model_signature()

    @classmethod
    def reset_singleton(cls) -> None:
        with cls._lock:
            cls._instance = None
