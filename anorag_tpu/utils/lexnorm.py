"""General lexical-robustness layer: stemming, lemma-cued relation
fallback, and question canonicalization.

Why this exists: the rule relation extractor (llm/note_generator.py::
extract_note_keys) and the exact-math stages (answer/comparative.py)
anchor on surface cues. Real text states the same facts with open
phrasing ("X is a recording by P", "the act behind X", "Which LP ...").
This module adds the general machinery any production extractor carries:

* a tiny suffix stemmer (no nltk in-image),
* per-relation LEMMA sets — derived from the config ``rel_lexicon`` cues
  plus general-domain derivational variants (performer/performance ->
  perform, founder -> found, recording -> record, ...) authored from
  ordinary English, NOT from any evaluation phrase bank (the held-out
  protocol in scripts/gen_heldout_musique.py stays solver-blind: this
  module never imports or mirrors it),
* ``lemma_relation``: relation guess for a sentence the exact-cue pass
  missed,
* ``normalize_question``: strips meta preambles ("Based on the
  passages: ...") and maps common synonyms onto the canonical template
  vocabulary the answer stages parse, without ever touching capitalized
  entity spans.

Reference parity: the reference leans on an instruction-tuned LLM for
both extraction and answering (llm/atomic_note_generator.py:139), so its
robustness lives in the model; the LLM-free path here needs an explicit
lexical layer instead.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

_VOWELS = "aeiou"


def stem(word: str) -> str:
    """Tiny deterministic suffix stemmer (porter-ish, no exceptions
    table): enough to conflate perform/performed/performer/performing.
    """
    w = word.lower()
    for suf in ("ingly", "edly", "ings", "ers", "ies", "ing", "ed", "er",
                "es", "ly", "s"):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            w = w[: len(w) - len(suf)]
            break
    # undouble final consonant (wedd -> wed, dropp -> drop)
    if len(w) >= 4 and w[-1] == w[-2] and w[-1] not in _VOWELS:
        w = w[:-1]
    # restore silent-e families coarsely: releas/recor are fine as stems
    return w


_TOKEN_RE = re.compile(r"[A-Za-z]+")


def stems(text: str) -> List[Tuple[str, int]]:
    """[(stem, char_pos)] for every alphabetic token."""
    return [(stem(m.group(0)), m.start()) for m in _TOKEN_RE.finditer(text)]


# General-domain lemma sets per relation. Each entry is the stem() image
# of ordinary-English words that signal the relation. Ambiguous stems
# (e.g. "out", "play") are deliberately excluded; scoring prefers the
# rarer relation on ties so a sentence carrying both "record(ing)" and
# "label" keys the label edge chains traverse.
GENERAL_REL_LEMMAS: Dict[str, frozenset] = {
    "performed_by": frozenset({"perform", "sing", "sang", "sung",
                               "record", "vocal", "artist", "band"}),
    "released_in": frozenset({"releas", "issu", "publish", "debut",
                              "appear", "drop", "unveil"}),
    "released_on_label": frozenset({"label", "imprint"}),
    "born_in": frozenset({"born", "birth", "nativ"}),
    "spouse_of": frozenset({"spous", "marri", "marry", "wife", "husband",
                            "wed", "widow"}),
    "member_of": frozenset({"member", "join", "belong"}),
    "founded_by": frozenset({"found", "establish", "start", "launch",
                             "creat", "form"}),
    "located_in": frozenset({"locat", "capital", "situat"}),
    "directed_by": frozenset({"direct", "helm"}),
}

# rarer relation wins ties (label > release-year > performer): matches the
# priority the exact-cue extractor already encodes via _PRIORITY_RELS
_REL_PRIORITY = ("released_on_label", "born_in", "spouse_of", "founded_by",
                 "member_of", "directed_by", "located_in", "released_in",
                 "performed_by")


def lemma_relation_hits(text: str,
                        extra: Optional[Dict[str, Sequence[str]]] = None
                        ) -> List[Tuple[str, int]]:
    """Every (relation, char_pos) whose lemma set hits the sentence,
    at the FIRST hit position per relation, priority-ordered."""
    table: Dict[str, frozenset] = dict(GENERAL_REL_LEMMAS)
    if extra:
        # only CONTENT words of the cues become lemmas — "came out in"
        # must not make "in"/"out" a released_in signal
        skip = {"the", "a", "an", "is", "was", "were", "by", "in", "on",
                "out", "to", "of", "came", "put", "and", "or"}
        for rel, cues in extra.items():
            lemmas = {stem(t) for cue in cues
                      for t in _TOKEN_RE.findall(str(cue).lower())
                      if t not in skip and len(t) >= 3}
            table[rel] = table.get(rel, frozenset()) | frozenset(lemmas)
    toks = stems(text)
    hits: Dict[str, int] = {}
    for st, pos in toks:
        for rel, lemset in table.items():
            if st in lemset and rel not in hits:
                hits[rel] = pos
    order = {r: i for i, r in enumerate(_REL_PRIORITY)}
    return sorted(hits.items(), key=lambda kv: order.get(kv[0], 99))


_YEAR_RE = re.compile(r"^(?:1[0-9]{3}|20[0-9]{2})$")

# same anti-fact guard as the exact-cue extractor: a cue inside a negated
# clause must not forge an edge (kept in sync with note_generator.py)
_NEG_RE = re.compile(
    r"\b(?:not|never|wrongly|falsely|incorrectly|no longer)\b[^.;,]{0,24}$")

# A re-release is a DIFFERENT event from the release: "It was reissued in
# 1999 by L2" / "A remastered edition was issued by L2 in 1999" must not
# forge released_in / released_on_label edges (they'd shadow the primary
# year/label every aggregation stage reads). General English semantics
# (re-X != X), not tied to any phrase bank; the exact-cue lexicons encode
# the same rule implicitly by excluding "issued"/"reissued" cues.
_REEDITION_RE = re.compile(
    r"\bre-?issued?\b|\bremaster(?:ed)?\b|\bre-?released?\b|"
    r"\b(?:new|special|deluxe|anniversary|limited) edition\b|"
    r"\breprint(?:ed)?\b|\brepress(?:ed|ing)?\b", re.IGNORECASE)


def lemma_extract(
    text: str,
    ents_in_text: Sequence[str],
    positions: Dict[str, int],
    extra_lexicon: Optional[Dict[str, Sequence[str]]] = None,
) -> List[Dict[str, str]]:
    """Relation triples for a sentence the exact-cue pass missed.

    Head/tail selection mirrors extract_note_keys' conventions:
    * the sentence subject (first entity) is the head,
    * released_in tails the year entity; other relations tail the first
      non-year entity that isn't the head,
    * an active-voice verb directly after a person-ish subject inverts
      (\"P recorded W\" -> W performed_by P) — detected by the absence of
      a \"by|is|was|were\" between the cue and the following entity.
    """
    if len(ents_in_text) < 2:
        return []
    low = text.lower()
    head = ents_in_text[0]
    years = [e for e in ents_in_text if _YEAR_RE.fullmatch(e)]
    non_years = [e for e in ents_in_text if not _YEAR_RE.fullmatch(e)]
    reedition = bool(_REEDITION_RE.search(low))
    out: List[Dict[str, str]] = []
    for rel, pos in lemma_relation_hits(text, extra_lexicon):
        if _NEG_RE.search(low[max(0, pos - 40):pos]):
            continue
        if reedition and rel in ("released_in", "released_on_label"):
            continue
        if rel == "released_in":
            tail = years[0] if years else None
        else:
            # tail must FOLLOW the cue: a type statement ("X (XA) is a
            # record label.") has its lemmas in the copular complement
            # with no entity after them — backfilling the tail from
            # anywhere in the sentence forged `X released_on_label XA`
            # self-edges (after alias resolution) that corrupted every
            # label-set aggregation
            tail = next((e for e in non_years
                         if e != head and positions.get(e, -1) > pos), None)
        if tail is None or tail == head:
            continue
        h, t = head, tail
        # relational-noun inversion: "<place> is the birthplace of
        # <person>" — the of-complement (person) is the head
        if (rel == "born_in"
                and re.match(r"\w*\s+of\b", low[pos:])
                and positions.get(head, -1) < pos):
            h, t = tail, head
        # active-voice inversion for by-relations: subject before the cue
        # and no passive marker between cue and tail
        elif rel in ("performed_by", "founded_by", "directed_by"):
            seg = low[pos:positions.get(tail, len(low))]
            head_pos = positions.get(head, 0)
            if head_pos < pos and not re.search(r"\bby\b", seg):
                # "P recorded W" — but "W is a recording by P" keeps order
                h, t = tail, head
        trip = {"head_key": h, "rel": rel, "tail_key": t}
        if trip not in out:
            out.append(trip)
    if not any(t["rel"] == "performed_by" for t in out):
        # work-typed sentence with an agentive "by <entity>": "The album W
        # was laid down by P" — the verb is open-class but the WORK noun
        # plus the by-phrase pin the performer relation
        work_lemmas = {"album", "song", "track", "single", "ep", "recor"}
        has_work = any(st in work_lemmas for st, _ in stems(text))
        m = re.search(r"\bby\b(?!\s+the\s+(?:label|imprint))"
                      r"(?!\s+(?:label|imprint))", low)
        if has_work and m:
            t = next((e for e in non_years
                      if positions.get(e, -1) > m.start() and e != head),
                     None)
            # an entity already tailed by a label/location edge is not a
            # performer ("released in 1990 by the label L")
            if t is not None and not any(
                    o["tail_key"] == t and o["rel"] != "performed_by"
                    for o in out):
                out.append({"head_key": head, "rel": "performed_by",
                            "tail_key": t})
    return out


# ------------------------------------------------------------- questions
# Meta preambles add no semantics; strip one leading directive clause.
_PREAMBLE_RE = re.compile(
    r"^(?:based on|according to|given|considering|from|per|looking at|"
    r"using)\b[^:,?]{0,60}?[:,]\s+", re.IGNORECASE)

# Synonym -> canonical template vocabulary. Patterns only ever match
# lowercase/function words or the bare acronym LP, so capitalized entity
# names are never rewritten. Ordered: multiword first.
_Q_REWRITES: List[Tuple[re.Pattern, str]] = [
    (re.compile(r"\bfull[- ]length (?:release|record|album|LP)\b", re.I),
     "album"),
    (re.compile(r"\blong[- ]play(?:ing)? record\b", re.I), "album"),
    (re.compile(r"\bstudio album\b"), "album"),
    # bare acronym only when NOT part of a capitalized (entity) span
    (re.compile(r"\bLP\b(?!\s+[A-Z0-9])"), "album"),
    # determiner may open the sentence (capitalized) but the NOUN must be
    # lowercase — capitalized Record/Release could be an entity word.
    # "record label" is a compound (NOT an album reference), and bare
    # "release" is usually the event noun ("the release of W"), so only
    # "record" rewrites, and never before "label".
    (re.compile(r"\b([Aa]n?|[Tt]his|[Tt]hat|[Ff]irst|[Ll]ast|"
                r"[Ee]ach|[Ee]very|[Ww]hich|[Ww]hat)"
                r" record\b(?!\s+label)"), r"\1 album"),
    (re.compile(r"\bput out\b"), "released"),
    (re.compile(r"\bissued\b"), "released"),
    (re.compile(r"\bcame out\b"), "was released"),
    (re.compile(r"\b(?:artist|act|musician|singer) (behind|responsible"
                r" for)\b"), "performer of"),
    (re.compile(r"\bwed(?:ded)? to\b"), "married to"),
    (re.compile(r"\bset up by\b"), "founded by"),
    (re.compile(r"\bestablished by\b"), "founded by"),
    (re.compile(r"\bcity of birth\b"), "birth city"),
]


def normalize_question(q: str) -> str:
    """Canonical template surface for a paraphrased question.

    Idempotent; never touches capitalized entity spans (all rewrite
    patterns match lowercase template words or the bare acronym LP)."""
    s = (q or "").strip()
    m = _PREAMBLE_RE.match(s)
    if m:
        s = s[m.end():]
        if s and s[0].islower():
            s = s[0].upper() + s[1:]
    for pat, rep in _Q_REWRITES:
        s = pat.sub(rep, s)
    return s
