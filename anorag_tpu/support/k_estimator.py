"""KEstimator: how many support paragraphs does this question need?

Parity target: /root/reference/support/k_estimator.py:18-460 — K is driven
by question complexity (hop markers, conjunctions, nested 'of the' chains)
and optionally the graph distance between the question anchors and the
answer; thresholds are calibratable.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

_NESTED_OF = re.compile(r"\bof the\b", re.IGNORECASE)
_CONJ = re.compile(r"\b(and|both|as well as)\b", re.IGNORECASE)
_COMPARATIVE = re.compile(r"\b(more|less|older|younger|earlier|later|than)\b", re.IGNORECASE)
_MULTIHOP_CUES = re.compile(
    r"\b(spouse|director|performer|author|founder|capital|mother|father|president)\b",
    re.IGNORECASE,
)


class KEstimator:
    def __init__(self, base_k: int = 2, max_k: int = 4, thresholds: Optional[Dict[str, float]] = None):
        self.base_k = base_k
        self.max_k = max_k
        self.thresholds = thresholds or {"complexity_per_k": 1.0}

    def question_complexity(self, question: str) -> float:
        q = question or ""
        score = 0.0
        score += len(_NESTED_OF.findall(q))          # each nesting ~ one hop
        score += 0.5 * len(_CONJ.findall(q))
        score += 0.5 * bool(_COMPARATIVE.search(q))
        score += 0.5 * min(len(_MULTIHOP_CUES.findall(q)), 2)
        return score

    def estimate_K(self, question: str, graph_distance: Optional[int] = None) -> int:
        k = self.base_k
        k += int(self.question_complexity(question) / max(self.thresholds["complexity_per_k"], 1e-6))
        if graph_distance is not None:
            k = max(k, graph_distance)
        return int(min(max(k, 1), self.max_k))

    def calibrate(self, dev_items: list, predicted_fn) -> Dict[str, Any]:
        """Sweep complexity_per_k to best match gold support counts."""
        best, best_err = self.thresholds["complexity_per_k"], float("inf")
        for cand in (0.5, 0.75, 1.0, 1.5, 2.0):
            self.thresholds["complexity_per_k"] = cand
            err = 0.0
            for item in dev_items:
                gold_k = len(item.get("gold_support_idxs", []) or []) or 2
                err += abs(self.estimate_K(item.get("question", "")) - gold_k)
            if err < best_err:
                best_err, best = err, cand
        self.thresholds["complexity_per_k"] = best
        return {"complexity_per_k": best, "abs_error": best_err}
