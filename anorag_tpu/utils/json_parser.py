"""Robust JSON extraction from LLM output.

Equivalent of the reference's robust_json_parser
(/root/reference/utils/robust_json_parser.py, used at
query_processor.py:2460): tolerate markdown fences, think-tags, leading
prose, trailing junk, single quotes, and trailing commas.
"""
from __future__ import annotations

import json
import re
from typing import Any, Callable, List, Optional

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)
_THINK_RE = re.compile(r"<think>.*?</think>", re.DOTALL)
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")
_CONTROL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _candidates(text: str) -> List[str]:
    text = _THINK_RE.sub("", text or "").strip()
    cands: List[str] = []
    for m in _FENCE_RE.finditer(text):
        cands.append(m.group(1).strip())
    cands.append(text)
    # First balanced {...} or [...] span — whichever opener appears first.
    openers = [(text.find(o), o, c) for o, c in (("{", "}"), ("[", "]")) if text.find(o) >= 0]
    for start, opener, closer in sorted(openers):
        depth = 0
        in_str = False
        esc = False
        for i in range(start, len(text)):
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == opener:
                depth += 1
            elif ch == closer:
                depth -= 1
                if depth == 0:
                    cands.append(text[start : i + 1])
                    break
    return cands


def _repair(blob: str) -> str:
    blob = _CONTROL_RE.sub("", blob)
    blob = _TRAILING_COMMA_RE.sub(r"\1", blob)
    return blob


def extract_json(text: str) -> Optional[Any]:
    """Best-effort parse of the first JSON value in `text`."""
    for cand in _candidates(text):
        for attempt in (cand, _repair(cand)):
            try:
                return json.loads(attempt)
            except Exception:
                continue
    return None


def extract_json_with_retry(
    text: str,
    retry_fn: Optional[Callable[[], str]] = None,
    max_retries: int = 1,
) -> Optional[Any]:
    """Parse; on failure re-ask the producer (usually a shortened re-prompt)."""
    parsed = extract_json(text)
    tries = 0
    while parsed is None and retry_fn is not None and tries < max_retries:
        tries += 1
        try:
            parsed = extract_json(retry_fn())
        except Exception:
            parsed = None
    return parsed


def extract_prediction(text: str) -> dict:
    """Parse a final-answer JSON ({answer, evidence_spans, ...}); fall back to
    treating raw text as the answer."""
    obj = extract_json(text)
    if isinstance(obj, dict) and "answer" in obj:
        return obj
    return {"answer": (text or "").strip(), "evidence_spans": [], "insufficient": not text}
