"""DocumentChunker: files/text -> paragraph-aware sentence chunks.

Parity target: /root/reference/doc/chunker.py — reads json/jsonl/txt
(docx degrades to a warning), paragraph-preserving sentence-level chunking
(:251) with max-char budgets, paragraph_idx mapping (:726), optional
event-aware chunking (boundary extension around event cue sentences, :374),
and low-quality chunk filtering (:782-803).

Chunk contract (consumed by AtomicNoteGenerator): {doc_id, chunk_index,
title, text, sentences, sentence_ids, paragraph_idx, paragraph_idx_mapping}.
"""
from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Dict, List, Sequence, Tuple

from anorag_tpu.utils.file_io import read_json, read_jsonl
from anorag_tpu.utils.logging import get_logger
from anorag_tpu.utils.text import split_paragraphs, split_sentences

logger = get_logger("anorag.doc")

_EVENT_CUES = re.compile(
    r"\b(founded|acquired|merged|married|died|born|released|launched|elected|"
    r"announced|won|moved|joined|left|resigned)\b", re.IGNORECASE)


class DocumentChunker:
    def __init__(self, max_chunk_chars: int = 512, overlap_chars: int = 0,
                 min_chunk_chars: int = 20, strategy: str = "sentence"):
        self.max_chunk_chars = max_chunk_chars
        self.overlap_chars = overlap_chars
        self.min_chunk_chars = min_chunk_chars
        self.strategy = strategy

    # ---------------------------------------------------------- file entry
    def chunk_file(self, path: str | Path) -> List[Dict[str, Any]]:
        path = Path(path)
        docs = self._load(path)
        out: List[Dict[str, Any]] = []
        for d in docs:
            out.extend(self.chunk_document(d))
        return out

    @staticmethod
    def _load(path: Path) -> List[Dict[str, Any]]:
        suffix = path.suffix.lower()
        if suffix == ".jsonl":
            return list(read_jsonl(path))
        if suffix == ".json":
            data = read_json(path)
            return data if isinstance(data, list) else [data]
        if suffix in (".txt", ".md"):
            text = path.read_text(encoding="utf-8")
            return [{"id": path.stem, "title": path.stem, "text": text}]
        if suffix == ".docx":
            logger.warning("docx not supported without python-docx; skipping %s", path)
            return []
        raise ValueError(f"unsupported document type: {path}")

    # ----------------------------------------------------------- doc entry
    def chunk_document(self, doc: Dict[str, Any]) -> List[Dict[str, Any]]:
        doc_id = str(doc.get("id") or doc.get("doc_id") or doc.get("_id") or "doc")
        title = str(doc.get("title") or "")
        paragraphs = self._paragraphs(doc)
        if not paragraphs:
            return []
        mapping = {i: p[:80] for i, (p, _) in enumerate(
            [(text, idx) for text, idx in paragraphs])}

        chunks: List[Dict[str, Any]] = []
        for text, pidx in paragraphs:
            if self.strategy == "event_aware":
                pieces = self._event_aware(text)
            else:
                pieces = self._sentence_pack(text)
            for sents in pieces:
                body = " ".join(sents)
                if len(body) < self.min_chunk_chars:
                    continue
                chunks.append({
                    "doc_id": doc_id,
                    "chunk_index": len(chunks),
                    "title": title,
                    "text": body,
                    "sentences": sents,
                    "sentence_ids": list(range(len(sents))),
                    "paragraph_idx": pidx,
                    "paragraph_idx_mapping": mapping,
                    "source_info": {"file_name": doc.get("file_name", "")},
                })
        return self._filter(chunks)

    def _paragraphs(self, doc: Dict[str, Any]) -> List[Tuple[str, int]]:
        """[(paragraph text, paragraph_idx)] — honors pre-split MuSiQue-style
        `paragraphs: [{idx, title, paragraph_text}]` payloads."""
        paras = doc.get("paragraphs")
        out: List[Tuple[str, int]] = []
        if isinstance(paras, list) and paras:
            for i, p in enumerate(paras):
                if isinstance(p, dict):
                    text = str(p.get("paragraph_text") or p.get("text") or "")
                    pt = str(p.get("title") or "")
                    idx = int(p.get("idx", i))
                    out.append(((f"{pt}. {text}" if pt else text).strip(), idx))
                else:
                    out.append((str(p), i))
            return [(t, i) for t, i in out if t]
        text = str(doc.get("text") or doc.get("content") or "")
        return [(p, i) for i, p in enumerate(split_paragraphs(text))]

    # ------------------------------------------------------------ packing
    def _sentence_pack(self, paragraph: str) -> List[List[str]]:
        """Greedy sentence packing under the char budget, with optional
        sentence-level overlap."""
        sents = split_sentences(paragraph)
        pieces: List[List[str]] = []
        cur: List[str] = []
        cur_len = 0
        for s in sents:
            if cur and cur_len + len(s) > self.max_chunk_chars:
                pieces.append(cur)
                if self.overlap_chars > 0:
                    # carry trailing sentences up to the overlap budget
                    keep, klen = [], 0
                    for t in reversed(cur):
                        if klen + len(t) > self.overlap_chars:
                            break
                        keep.insert(0, t)
                        klen += len(t)
                    cur, cur_len = keep, klen
                else:
                    cur, cur_len = [], 0
            cur.append(s)
            cur_len += len(s)
        if cur:
            pieces.append(cur)
        return pieces

    def _event_aware(self, paragraph: str) -> List[List[str]]:
        """Keep event-cue sentences joined with their neighbors (event-chain
        extension), then pack under the budget."""
        sents = split_sentences(paragraph)
        groups: List[List[str]] = []
        cur: List[str] = []
        for i, s in enumerate(sents):
            cur.append(s)
            is_event = bool(_EVENT_CUES.search(s))
            next_event = i + 1 < len(sents) and bool(_EVENT_CUES.search(sents[i + 1]))
            if not (is_event or next_event):
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        # re-pack groups under the char budget
        pieces: List[List[str]] = []
        for g in groups:
            body = " ".join(g)
            if len(body) <= self.max_chunk_chars:
                pieces.append(g)
            else:
                pieces.extend(self._sentence_pack(body))
        return pieces

    # ------------------------------------------------------------- filter
    def _filter(self, chunks: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        out = []
        for i, c in enumerate(chunks):
            text = c["text"]
            words = text.split()
            if len(text) < self.min_chunk_chars or len(words) < 3:
                continue
            alpha_ratio = sum(ch.isalnum() or ch.isspace() for ch in text) / max(len(text), 1)
            if alpha_ratio < 0.5:
                continue
            c["chunk_index"] = len(out)
            out.append(c)
        return out
