"""Deterministic comparative-question answering ("Which was released
first, A or B?").

Parity target: the reference has no exact comparative math — it routes
comparative questions to the LLM via the query-type classification in
/root/reference/llm/prompts/__init__.py:235 and answers from generation.
This module is the LLM-free exact equivalent, in the same spirit as
answer/efsa.py (reference answer/efsa_answer.py: do exact span math
before generation): parse the two options named in the question, resolve
each option's compared attribute (a year) from the note graph's triples
— falling back to a regex scan of the retrieved candidates — compare,
and answer with the winning option's title verbatim.

No relation chain solves these questions (the compared works are
parallel, not nested), and the answer IS an entity named in the question
— so the stage must run before the rel-chain selector (whose 1-hop
`released_in` chain would answer with a bare year) and outside EFSA's
question-entity exclusion.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

from anorag_tpu.graph.note_graph import NoteGraph

# superlative/ comparative ordinal -> pick min or max of the attribute
_ORD_MIN = r"first|earliest|earlier|oldest"
_ORD_MAX = r"last|latest|later|newest|most\s+recently"

# "Which (album|work|...) was released first, A or B?"  /
# "Which was founded earlier: A or B?"
_CMP_RE = re.compile(
    r"\bwhich\b[^,:?]*?\b(?P<verb>released|founded|established|formed|"
    r"created|published|recorded|built|made)\b[^,:?]*?"
    r"\b(?P<ord>" + _ORD_MIN + r"|" + _ORD_MAX + r")\b"
    r"\s*[,:]\s*(?P<a>.+?)\s+or\s+(?P<b>.+?)\s*\??\s*$",
    re.IGNORECASE)

# "Which of A or/and B was released first?"
_CMP_RE_PREFIX = re.compile(
    r"\bwhich\s+of\s+(?P<a>.+?)\s+(?:or|and)\s+(?P<b>.+?)\s+"
    r"(?:was|is|were|got)\b[^?]*?\b(?P<verb>released|founded|established|"
    r"formed|created|published|recorded|built|made)\b[^?]*?"
    r"\b(?P<ord>" + _ORD_MIN + r"|" + _ORD_MAX + r")\b",
    re.IGNORECASE)

# verb stem -> note-graph relations that carry its year attribute
_VERB_RELS = {
    "released": ("released_in",),
    "founded": ("founded_in", "established_in"),
    "established": ("established_in", "founded_in"),
    "formed": ("formed_in", "founded_in"),
    "created": ("created_in",),
    "published": ("published_in", "released_in"),
    "recorded": ("recorded_in", "released_in"),
    "built": ("built_in",),
    "made": ("made_in", "released_in"),
}

_YEAR_RE = re.compile(r"\b(1[0-9]{3}|20[0-9]{2})\b")


def parse_comparative(question: str) -> Optional[Dict[str, Any]]:
    """{options: [a, b], verb, pick: 'min'|'max'} or None."""
    q = (question or "").strip()
    m = _CMP_RE.search(q) or _CMP_RE_PREFIX.search(q)
    if not m:
        return None
    ordinal = re.sub(r"\s+", " ", m.group("ord").lower())
    pick = "min" if re.fullmatch(_ORD_MIN, ordinal) else "max"
    opts = [m.group("a").strip().strip('"'), m.group("b").strip().strip('"')]
    if not all(opts):
        return None
    return {"options": opts, "verb": m.group("verb").lower(), "pick": pick}


def _year_from_graph(option: str, rels: Sequence[str],
                     graph: NoteGraph) -> Optional[Tuple[int, str]]:
    """(year, note_id) for `option`'s attribute triple, or None. Head keys
    are matched case-insensitively; the option may carry a type suffix the
    note key lacks ("W (album)")."""
    key = graph.resolve_head(option)
    if key is None:
        return None
    want = set(rels)
    for rel, tail, note_id, _w, _p in graph.neighbors(key):
        if rel in want:
            m = _YEAR_RE.search(str(tail))
            if m:
                return int(m.group(1)), note_id
    return None


def _year_from_candidates(option: str, verb: str,
                          candidates: Sequence[Dict[str, Any]]
                          ) -> Optional[Tuple[int, Dict[str, Any]]]:
    """Regex fallback over retrieved notes: a sentence naming the option
    and the verb stem, carrying a year."""
    opt = option.lower()
    stem = verb[:6]
    for c in candidates or ():
        text = f"{c.get('title', '')} {c.get('content', '')}"
        low = text.lower()
        if opt not in low and opt not in str(c.get("title", "")).lower():
            continue
        for sent in re.split(r"(?<=[.!?])\s+", text):
            sl = sent.lower()
            if stem not in sl:
                continue
            m = _YEAR_RE.search(sent)
            if m:
                return int(m.group(1)), c
    return None


def answer_comparative(
    question: str,
    note_graph: Optional[NoteGraph],
    candidates: Sequence[Dict[str, Any]],
) -> Optional[Dict[str, Any]]:
    """{answer, support_idxs, years, method} for a comparative question,
    or None when the question isn't comparative / an option's attribute
    can't be resolved (callers fall through to the regular stages)."""
    parsed = parse_comparative(question)
    if not parsed:
        return None
    rels = _VERB_RELS.get(parsed["verb"], ())
    resolved: List[Tuple[str, int, List[int]]] = []   # (option, year, paras)
    for opt in parsed["options"]:
        got = _year_from_graph(opt, rels, note_graph) if note_graph else None
        if got is not None:
            year, note_id = got
            note = note_graph.notes.get(note_id, {})
            paras = list(note.get("paragraph_idxs") or [])
        else:
            fb = _year_from_candidates(opt, parsed["verb"], candidates)
            if fb is None:
                return None
            year, note = fb
            paras = list(note.get("paragraph_idxs") or [])
        resolved.append((opt, year, paras))
    ya, yb = resolved[0][1], resolved[1][1]
    if ya == yb:
        return None                      # tie: exact math can't order them
    best = min(resolved, key=lambda t: t[1]) if parsed["pick"] == "min" \
        else max(resolved, key=lambda t: t[1])
    support = list(dict.fromkeys(resolved[0][2] + resolved[1][2]))
    return {"answer": best[0], "support_idxs": support,
            "years": {o: y for o, y, _ in resolved}, "method": "comparative"}
