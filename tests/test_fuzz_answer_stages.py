"""Property/fuzz tests: the rule-extraction and exact-math layers must
never crash on adversarial input — garbage text, regex metacharacters in
entity surfaces, empty/degenerate graphs — and must return their
contractual shapes (a dict with head/rel/tail or {}, a result dict with
answer/support_idxs/method or None).

Parity rationale: the reference feeds LLM output through defensive JSON
parsing (utils/json_utils.py); the LLM-free rule path here has the same
exposure to arbitrary text and must be equally unkillable.
"""
import string

import numpy as np

from anorag_tpu.answer.comparative import answer_exact_math
from anorag_tpu.graph.note_graph import NoteGraph
from anorag_tpu.llm.note_generator import (extract_all_note_keys,
                                           extract_note_keys,
                                           resolve_note_abbreviations)

_CHARS = (string.ascii_letters + string.digits + " ...,;()[]{}+*?\\|^$\"'"
          + "éüñ—")


def _rand_text(rng, n):
    return "".join(rng.choice(list(_CHARS), n))


def test_extract_note_keys_never_crashes_on_garbage():
    rng = np.random.default_rng(0)
    for _ in range(300):
        text = _rand_text(rng, int(rng.integers(0, 120)))
        n_ents = int(rng.integers(0, 5))
        ents = []
        for _ in range(n_ents):
            if rng.random() < 0.5 and len(text) > 4:
                a = int(rng.integers(0, len(text) - 1))
                b = int(rng.integers(a + 1, min(a + 20, len(text))))
                ents.append(text[a:b])            # substrings of the text
            else:
                ents.append(_rand_text(rng, int(rng.integers(1, 12))))
        out = extract_note_keys(text, ents)
        assert isinstance(out, dict)
        if out:
            assert "rel" in out or "head_key" in out
        out2 = extract_all_note_keys(text, ents)
        assert isinstance(out2, dict)


def test_extract_note_keys_regex_metachar_entities():
    """Entity surfaces containing regex metacharacters must not break the
    word-boundary position search (re.escape) or the offset machinery."""
    for ents in (["A+B (Band)", "C|D"], ["(((", ")))"], ["a.b*c", "x?y"],
                 ["$100", "^start"], ["[brackets]", "{braces}"]):
        out = extract_note_keys(
            f"{ents[0]} was released in 1990 on the label {ents[1]}.", ents)
        assert isinstance(out, dict)


def test_resolve_abbreviations_never_crashes():
    rng = np.random.default_rng(1)
    notes = []
    for _ in range(60):
        notes.append({
            "text": _rand_text(rng, int(rng.integers(0, 80))),
            "entities": [_rand_text(rng, 6)
                         for _ in range(int(rng.integers(0, 3)))],
        })
    # plus shaped notes with missing/None fields
    notes += [{"text": None}, {}, {"text": "X (Y)", "entities": None},
              {"text": "Aa Bb (AB) ok. AB said hi.",
               "head_key": "AB", "rel": "said", "tail_key": "hi",
               "secondary_keys": [{"head_key": "AB"}]}]
    out = resolve_note_abbreviations(notes)
    assert out is notes
    assert out[-1]["head_key"] == "Aa Bb"
    assert out[-1]["secondary_keys"][0]["head_key"] == "Aa Bb"


def _rand_graph(rng):
    g = NoteGraph()
    rels = ["released_in", "released_on_label", "performed_by", "born_in",
            "founded_by", "spouse_of", "related_to", "released_offset"]
    notes = []
    for i in range(int(rng.integers(0, 25))):
        notes.append({
            "note_id": f"f{i}",
            "content": _rand_text(rng, 30),
            "head_key": _rand_text(rng, int(rng.integers(1, 10))),
            "rel": str(rng.choice(rels)),
            "tail_key": str(rng.choice(
                [_rand_text(rng, 8), str(rng.integers(1000, 2100)),
                 "3 years after X", ""])),
            "paragraph_idxs": [int(rng.integers(0, 20))],
        })
    g.add_notes(notes)
    return g


_QUESTIONS = [
    "Which was released first, {a} or {b}?",
    "How many years after the release of {a} was {b} released?",
    "Was {a} released before {b}?",
    "Which album on the label {a} was released first?",
    "What was the second album released on the label {a}?",
    "Which album on the label {a} was released in the 1990s?",
    "Which record label released both {a} and {b}?",
    "Which album by {a} was released on the label {b}?",
    "Which album by {a} was not released on the label {b}?",
    "How many albums on the label {a} were released in the 1970s?",
    "How many albums were released on the label {a}?",
    "Which album by {a} was released first?",
    "Were the performer of {a} and the performer of {b} born in the "
    "same city?",
    "How many years after the release of the first album on the label "
    "{a} was {b} released?",
    "",
    "???",
    "Which was released first, or ?",
]


def test_exact_math_never_crashes_on_random_graphs():
    """Every exact-math family over random graphs and degenerate
    questions: None or a contract-shaped dict, never an exception."""
    rng = np.random.default_rng(2)
    for trial in range(60):
        g = _rand_graph(rng)
        a = _rand_text(rng, int(rng.integers(1, 12)))
        b = _rand_text(rng, int(rng.integers(1, 12)))
        for tmpl in _QUESTIONS:
            q = tmpl.format(a=a, b=b) if "{a}" in tmpl else tmpl
            res = answer_exact_math(q, g, [])
            if res is not None:
                assert isinstance(res["answer"], str)
                assert isinstance(res["support_idxs"], list)
                assert res["method"]


def test_exact_math_none_graph_and_candidates():
    for tmpl in _QUESTIONS:
        q = tmpl.format(a="Alpha Steps", b="Beta River") \
            if "{a}" in tmpl else tmpl
        res = answer_exact_math(q, None, [])
        assert res is None or isinstance(res, dict)
    # candidate fallback path with malformed candidate rows
    cands = [{"title": None, "content": None}, {}, {"content": 42},
             {"title": "Alpha Steps",
              "content": "Alpha Steps was released in 1990."},
             {"title": "Beta River",
              "content": "Beta River was released in 1984."}]
    res = answer_exact_math(
        "Which was released first, Alpha Steps or Beta River?", None, cands)
    assert res is not None and res["answer"] == "Beta River"


def test_relation_gate_unknown_verb_declines():
    """v12 kind 33: 'Who produced W?' over a corpus whose paragraphs
    exist but never state a producer must come back unanswerable, while
    lexicon verbs with paraphrase-only evidence still answer."""
    from anorag_tpu.config import ConfigLoader
    from anorag_tpu.query.processor import QueryProcessor

    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")
    notes = [
        {"note_id": "n0", "doc_id": "d", "title": "Velgor Echo (album)",
         "content": "Velgor Echo is a record by Mariko Tan. It came out "
                    "in 1988 on the label Prilu Sound.",
         "text": "Velgor Echo is a record by Mariko Tan. It came out in "
                 "1988 on the label Prilu Sound.",
         "entities": ["Velgor Echo", "Mariko Tan", "Prilu Sound"],
         "paragraph_idxs": [0],
         "head_key": "Velgor Echo", "rel": "performed_by",
         "tail_key": "Mariko Tan"},
    ]
    qp = QueryProcessor(notes, cfg=cfg, llm=None)
    out = qp.process("Who produced Velgor Echo?")
    assert out["predicted_answerable"] is False, out
    # the paraphrase-only performer fact still answers (known stem)
    out = qp.process("Who performed Velgor Echo?")
    assert out["predicted_answerable"] is True
    assert out["answer"] == "Mariko Tan"
