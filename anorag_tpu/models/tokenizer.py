"""Tokenizers.

Two backends:
  * HashTokenizer — deterministic, dependency-free: words are hashed into a
    fixed vocab. Lets the whole pipeline (encoder input, tests, benchmarks)
    run with zero downloaded assets.
  * HFTokenizer — wraps a locally-cached HuggingFace tokenizer when present
    (the reference uses the bge-m3 tokenizer via sentence-transformers,
    /root/reference/vector_store/embedding_manager.py:6-8). Gated: never
    downloads.
"""
from __future__ import annotations

import hashlib
from typing import List, Optional, Sequence

import numpy as np

from anorag_tpu.utils.text import tokenize

CLS_ID = 0
SEP_ID = 1
PAD_ID = 2
_RESERVED = 3


def stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


class HashTokenizer:
    """word -> stable hash bucket in [RESERVED, vocab_size)."""

    def __init__(self, vocab_size: int = 250002, max_length: int = 512):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def token_ids(self, text: str) -> List[int]:
        span = self.vocab_size - _RESERVED
        return [_RESERVED + (stable_hash(w) % span) for w in tokenize(text)]

    def encode(self, text: str, max_length: Optional[int] = None) -> List[int]:
        max_length = max_length or self.max_length
        ids = [CLS_ID] + self.token_ids(text)[: max_length - 2] + [SEP_ID]
        return ids

    def encode_batch(
        self, texts: Sequence[str], max_length: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (token_ids (B, L) i32 padded, attention mask (B, L) i32).

        L is the max sequence length in the batch rounded up to a multiple of
        128 (static-shape buckets to bound recompiles).
        """
        max_length = max_length or self.max_length
        encoded = [self.encode(t, max_length) for t in texts]
        width = max(len(e) for e in encoded) if encoded else 1
        width = min(max_length, ((width + 127) // 128) * 128)
        ids = np.full((len(encoded), width), PAD_ID, np.int32)
        mask = np.zeros((len(encoded), width), np.int32)
        for i, e in enumerate(encoded):
            e = e[:width]
            ids[i, : len(e)] = e
            mask[i, : len(e)] = 1
        return ids, mask


def load_hf_tokenizer(model_name: str):
    """Locally-cached HF tokenizer or None (no network)."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(model_name, local_files_only=True)
    except Exception:
        return None


class HFTokenizer:
    def __init__(self, hf_tok, max_length: int = 512):
        self._tok = hf_tok
        self.max_length = max_length
        self.vocab_size = hf_tok.vocab_size

    def encode_batch(self, texts: Sequence[str], max_length: Optional[int] = None):
        enc = self._tok(
            list(texts),
            padding=True,
            truncation=True,
            max_length=max_length or self.max_length,
            return_tensors="np",
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(np.int32)


def get_tokenizer(model_name: str = "", vocab_size: int = 250002, max_length: int = 512):
    if model_name:
        hf = load_hf_tokenizer(model_name)
        if hf is not None:
            return HFTokenizer(hf, max_length)
    return HashTokenizer(vocab_size, max_length)
