"""RetrievalGuardrail: quality gate + prioritized fallbacks.

Parity target: /root/reference/retrieval/retrieval_guardrail.py:80-470 —
run the primary retrieval, check acceptability (min result count, min score,
timeout), and on failure walk a prioritized chain of fallback handlers
(keyword search, fuzzy match, cached results). Levels strict / moderate /
lenient adjust thresholds.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence

from anorag_tpu.index.entity_index import levenshtein_ratio
from anorag_tpu.utils.logging import get_logger
from anorag_tpu.utils.text import tokenize_no_stop

logger = get_logger("anorag.guardrail")

LEVELS = {
    "strict": {"min_results": 3, "min_score": 0.3},
    "moderate": {"min_results": 1, "min_score": 0.1},
    "lenient": {"min_results": 1, "min_score": 0.0},
}


class FallbackHandler:
    name = "base"
    priority = 0

    def retrieve(self, query: str, notes: Sequence[Dict[str, Any]], top_k: int) -> List[Dict[str, Any]]:
        raise NotImplementedError


class KeywordSearchHandler(FallbackHandler):
    name = "keyword_search"
    priority = 1

    def retrieve(self, query, notes, top_k):
        q = set(tokenize_no_stop(query))
        scored = []
        for n in notes:
            toks = set(tokenize_no_stop(f"{n.get('title','')} {n.get('content','')}"))
            ov = len(q & toks)
            if ov:
                scored.append((ov / max(len(q), 1), n))
        scored.sort(key=lambda t: -t[0])
        out = []
        for s, n in scored[:top_k]:
            m = dict(n)
            m["final_score"] = s
            m["retrieval_info"] = {"method": "keyword_fallback"}
            out.append(m)
        return out


class FuzzyMatchHandler(FallbackHandler):
    name = "fuzzy_match"
    priority = 2

    def __init__(self, threshold: float = 0.6):
        self.threshold = threshold

    def retrieve(self, query, notes, top_k):
        q = " ".join(tokenize_no_stop(query))[:80]
        scored = []
        for n in notes:
            t = " ".join(tokenize_no_stop(n.get("title") or ""))[:80]
            if not t:
                continue
            r = levenshtein_ratio(q, t)
            if r >= self.threshold:
                scored.append((r, n))
        scored.sort(key=lambda t: -t[0])
        out = []
        for s, n in scored[:top_k]:
            m = dict(n)
            m["final_score"] = s
            m["retrieval_info"] = {"method": "fuzzy_fallback"}
            out.append(m)
        return out


class CachedResultsHandler(FallbackHandler):
    name = "cached_results"
    priority = 3

    def __init__(self):
        self._cache: Dict[str, List[Dict[str, Any]]] = {}

    def remember(self, query: str, results: List[Dict[str, Any]]) -> None:
        self._cache[query.strip().lower()] = results

    def retrieve(self, query, notes, top_k):
        return list(self._cache.get(query.strip().lower(), []))[:top_k]


class RetrievalGuardrail:
    def __init__(
        self,
        notes: Sequence[Dict[str, Any]],
        level: str = "moderate",
        min_results: Optional[int] = None,
        min_score: Optional[float] = None,
        timeout_seconds: float = 30.0,
        handlers: Optional[List[FallbackHandler]] = None,
    ):
        lv = LEVELS.get(level, LEVELS["moderate"])
        self.notes = list(notes)
        self.min_results = lv["min_results"] if min_results is None else min_results
        self.min_score = lv["min_score"] if min_score is None else min_score
        self.timeout_seconds = timeout_seconds
        self.cache = CachedResultsHandler()
        self.handlers = sorted(
            handlers if handlers is not None
            else [KeywordSearchHandler(), FuzzyMatchHandler(), self.cache],
            key=lambda h: h.priority,
        )
        self.stats = {"primary_ok": 0, "fallback_used": 0, "failed": 0}

    def acceptable(self, results: List[Dict[str, Any]], elapsed: float) -> bool:
        if elapsed > self.timeout_seconds:
            return False
        if len(results) < self.min_results:
            return False
        best = max((r.get("final_score", r.get("similarity", 0.0)) for r in results), default=0.0)
        return best >= self.min_score

    def retrieve_with_guardrail(
        self,
        query: str,
        primary: Callable[[str], List[Dict[str, Any]]],
        top_k: int = 20,
    ) -> Dict[str, Any]:
        t0 = time.perf_counter()
        try:
            results = primary(query) or []
        except Exception as e:
            logger.warning("primary retrieval raised: %s", e)
            results = []
        elapsed = time.perf_counter() - t0
        if self.acceptable(results, elapsed):
            self.stats["primary_ok"] += 1
            self.cache.remember(query, results)
            return {"results": results, "source": "primary", "elapsed": elapsed}

        for h in self.handlers:
            fb = h.retrieve(query, self.notes, top_k)
            if fb and self.acceptable(fb, 0.0):
                self.stats["fallback_used"] += 1
                return {"results": fb, "source": h.name, "elapsed": elapsed}
        self.stats["failed"] += 1
        return {"results": results, "source": "primary_unchecked", "elapsed": elapsed}
