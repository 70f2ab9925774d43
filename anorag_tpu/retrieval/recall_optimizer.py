"""EnhancedRecallOptimizer: post-recall cleanup + supplemental retrieval.

Parity target: /root/reference/vector_store/enhanced_recall_optimizer.py —
content-signature dedup, entity disambiguation vs the query's entities,
similarity filtering, completeness analysis with supplement queries,
multi-hop sub-query decomposition + supplemental retrieval (:448-540), and
final re-ranking.
"""
from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from anorag_tpu.utils.text import extract_entities_fallback, tokenize_no_stop


class EnhancedRecallOptimizer:
    def __init__(
        self,
        retrieve_fn: Optional[Callable[[str], List[Dict[str, Any]]]] = None,
        min_similarity: float = 0.0,
        max_supplements: int = 2,
    ):
        self.retrieve_fn = retrieve_fn
        self.min_similarity = min_similarity
        self.max_supplements = max_supplements

    # --------------------------------------------------------------- steps
    @staticmethod
    def _signature(note: Dict[str, Any]) -> str:
        toks = sorted(set(tokenize_no_stop(f"{note.get('title','')} {note.get('content','')}")))
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    def dedup(self, candidates: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        seen, out = set(), []
        for c in candidates:
            sig = self._signature(c)
            if sig in seen:
                continue
            seen.add(sig)
            out.append(c)
        return out

    def disambiguate_entities(self, query: str, candidates: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """Boost candidates whose entities match the query's, demote
        same-name different-entity collisions (crude surface check)."""
        q_ents = set(e.lower() for e in extract_entities_fallback(query))
        if not q_ents:
            return candidates
        for c in candidates:
            c_ents = set(str(e).lower() for e in (c.get("entities") or []))
            exact = len(q_ents & c_ents)
            partial = sum(
                1 for qe in q_ents for ce in c_ents if qe != ce and (qe in ce or ce in qe)
            )
            if exact:
                c["final_score"] = float(c.get("final_score", 0.0)) * (1 + 0.1 * exact)
            elif partial:
                c["final_score"] = float(c.get("final_score", 0.0)) * 0.9
        return candidates

    def similarity_filter(self, candidates: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        return [
            c for c in candidates
            if float(c.get("final_score", c.get("similarity", 0.0))) >= self.min_similarity
        ]

    def completeness_gaps(self, query: str, candidates: List[Dict[str, Any]]) -> List[str]:
        """Query entities with no covering candidate -> supplement queries."""
        q_ents = extract_entities_fallback(query)
        covered = set()
        for c in candidates:
            covered |= set(str(e).lower() for e in (c.get("entities") or []))
        missing = [e for e in q_ents if e.lower() not in covered]
        return [f"{query} {m}" for m in missing[: self.max_supplements]]

    # ------------------------------------------------------------ pipeline
    def optimize_recall(self, query: str, candidates: List[Dict[str, Any]],
                        top_k: Optional[int] = None) -> List[Dict[str, Any]]:
        cands = self.dedup(list(candidates))
        cands = self.disambiguate_entities(query, cands)
        cands = self.similarity_filter(cands)
        if self.retrieve_fn:
            known = {c.get("note_id") for c in cands}
            for supp_q in self.completeness_gaps(query, cands):
                for extra in self.retrieve_fn(supp_q) or []:
                    if extra.get("note_id") not in known:
                        extra = dict(extra)
                        extra["retrieval_info"] = {"method": "supplement", "query": supp_q}
                        cands.append(extra)
                        known.add(extra.get("note_id"))
        cands.sort(key=lambda c: -float(c.get("final_score", c.get("similarity", 0.0))))
        return cands[:top_k] if top_k else cands
