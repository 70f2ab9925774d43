"""Entity-type registry + type-signature orientation + question frames.

Covers the round-5 generalization layer (utils/semtype.py and the
lexnorm extensions): corpus-level typing from adjacency cues, free
clause-order triple orientation, idiom relation hits with entity-span
masking, and intent-frame question canonicalization. All surfaces here
are invented for the tests — none comes from a heldout bank
(HELDOUT.md separation rules).
"""
import re

import pytest

from anorag_tpu.utils.lexnorm import (lemma_extract, lemma_relation_hits,
                                      normalize_question)
from anorag_tpu.utils.semtype import (EntityTypeRegistry, orient,
                                      typed_default_triples)


def _registry():
    reg = EntityTypeRegistry()
    for t, e in [
        ("Kesfen Summit is an album by Migor Tolin.",
         ["Kesfen Summit", "Migor Tolin"]),
        ("Nehol Audio is a record label.", ["Nehol Audio"]),
        ("Migor Tolin was born in Ludham.", ["Migor Tolin", "Ludham"]),
        ("It was released in 1989 on the label Nehol Audio.",
         ["1989", "Nehol Audio"]),
    ]:
        reg.observe(t, e)
    return reg


def _extract(text, ents, types):
    low = text.lower()
    pos = {}
    for e in ents:
        m = re.search(r"(?<!\w)" + re.escape(e.lower()) + r"(?!\w)", low)
        pos[e] = m.start() if m else -1
    ents_in = sorted([e for e in ents if pos[e] >= 0], key=lambda e: pos[e])
    return lemma_extract(text, ents_in, pos, types=types)


class TestTypeRegistry:
    def test_adjacency_types(self):
        reg = _registry()
        assert reg.type_of("Kesfen Summit") == "work"
        assert reg.type_of("Migor Tolin") == "person"
        assert reg.type_of("Nehol Audio") == "label"
        assert reg.type_of("Ludham") == "place"
        assert reg.type_of("1989") == "year"

    def test_unknown_entity_untyped(self):
        assert _registry().type_of("Zanzibar Confusion") is None

    def test_orient_by_signature(self):
        types = {"W": "work", "P": "person", "L": "label", "Y": "year"}
        assert orient("performed_by", ["P", "W"], types) == ("W", "P")
        assert orient("founded_by", ["P", "L"], types) == ("L", "P")
        assert orient("released_on_label", ["L", "W"], types) == ("W", "L")
        # symmetric relation -> None (syntax decides)
        assert orient("spouse_of", ["P", "P2"],
                      {"P": "person", "P2": "person"}) is None

    def test_orient_untyped_slot_fallback(self):
        # person + one untyped entity: born_in accepts the untyped place
        types = {"P": "person", "X": None}
        assert orient("born_in", ["P", "X"], types) == ("P", "X")

    def test_typed_default_performer(self):
        types = {"W": "work", "P": "person"}
        out = typed_default_triples(["P", "W"], types)
        assert out == [{"head_key": "W", "rel": "performed_by",
                        "tail_key": "P"}]
        assert typed_default_triples(["P", "W"], types,
                                     existing_rels=["performed_by"]) == []


class TestTypedLemmaExtract:
    def setup_method(self):
        self.reg = _registry()
        self.types = self.reg.types_for(
            ["Kesfen Summit", "Migor Tolin", "Nehol Audio", "Ludham",
             "1989"])

    def test_free_clause_order_founded(self):
        out = _extract("The founding of Nehol Audio was the work of "
                       "Migor Tolin.", ["Nehol Audio", "Migor Tolin"],
                       self.types)
        assert {"head_key": "Nehol Audio", "rel": "founded_by",
                "tail_key": "Migor Tolin"} in out

    def test_free_clause_order_performer(self):
        out = _extract("Behind the album Kesfen Summit stands Migor Tolin.",
                       ["Kesfen Summit", "Migor Tolin"], self.types)
        assert {"head_key": "Kesfen Summit", "rel": "performed_by",
                "tail_key": "Migor Tolin"} in out

    def test_idiom_born(self):
        out = _extract("Migor Tolin first saw the light of day in Ludham.",
                       ["Migor Tolin", "Ludham"], self.types)
        assert {"head_key": "Migor Tolin", "rel": "born_in",
                "tail_key": "Ludham"} in out

    def test_typed_default_work_person(self):
        out = _extract("Among Migor Tolin's output is the record "
                       "Kesfen Summit.", ["Migor Tolin", "Kesfen Summit"],
                       self.types)
        assert {"head_key": "Kesfen Summit", "rel": "performed_by",
                "tail_key": "Migor Tolin"} in out

    def test_release_with_label_and_year(self):
        out = _extract("In 1989 the label Nehol Audio made Kesfen Summit "
                       "available.", ["1989", "Nehol Audio", "Kesfen Summit"],
                       self.types)
        assert {"head_key": "Kesfen Summit", "rel": "released_in",
                "tail_key": "1989"} in out
        assert {"head_key": "Kesfen Summit", "rel": "released_on_label",
                "tail_key": "Nehol Audio"} in out

    def test_entity_span_masking(self):
        # a work titled "Origins" must not key born_in through its name
        hits = lemma_relation_hits("Bagor Origins is an album.",
                                   mask_spans=[(0, len("Bagor Origins"))])
        assert all(rel != "born_in" for rel, _ in hits)


class TestQuestionFrames:
    @pytest.mark.parametrize("q,want", [
        ("Name the city where the performer of Kesfen Summit was born.",
         "Where was the performer of Kesfen Summit born?"),
        ("Identify the birth city of Migor Tolin.",
         "Where was Migor Tolin born?"),
        ("State Migor Tolin's city of birth.",
         "Where was Migor Tolin born?"),
        ("Migor Tolin was born in what city?",
         "Where was Migor Tolin born?"),
        ("The performer of Kesfen Summit is who?",
         "Who performed Kesfen Summit?"),
        ("Which artist is heard on Kesfen Summit?",
         "Who performed Kesfen Summit?"),
        ("To whom is Migor Tolin married?",
         "Who is the spouse of Migor Tolin?"),
        ("Who did Migor Tolin marry?",
         "Who is the spouse of Migor Tolin?"),
        ("In what year did Kesfen Summit reach the public?",
         "When was Kesfen Summit released?"),
        ("What year saw the release of Kesfen Summit?",
         "When was Kesfen Summit released?"),
        ("Of Kesfen Summit and Mion Signal, which one came earlier?",
         "Which was released first, Kesfen Summit or Mion Signal?"),
        ("Does Kesfen Summit hold a larger tracklist than Mion Signal?",
         "Does Kesfen Summit have more tracks than Mion Signal?"),
    ])
    def test_frames(self, q, want):
        assert normalize_question(q) == want

    @pytest.mark.parametrize("q", [
        "Where was Migor Tolin born?",
        "Who performed Kesfen Summit?",
        "Who is the spouse of Migor Tolin?",
        "When was Kesfen Summit released?",
        "Which was released first, Kesfen Summit or Mion Signal?",
        "Does Kesfen Summit have more tracks than Mion Signal?",
        "Was Migor Tolin born in the same city as Lutofen Vask?",
        "How many albums released on the label Nehol Audio came out "
        "before 1990?",
    ])
    def test_canonical_fixed_point(self, q):
        out = normalize_question(q)
        assert normalize_question(out) == out
        # whole-question frames never fire on comparison/aggregate shapes
        if "same city" in q or "How many" in q:
            assert out[:20] == normalize_question(q)[:20]
