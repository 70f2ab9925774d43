"""Lexical-robustness layer (utils/lexnorm.py): stemmer, lemma-cued
relation fallback, question canonicalization — the general machinery that
keeps extraction and stage parsing alive on open paraphrases (reference
gets this robustness from its LLM, llm/atomic_note_generator.py:139)."""
from anorag_tpu.utils.lexnorm import (lemma_extract, lemma_relation_hits,
                                      normalize_question, stem)


def _pos(s, ents):
    return {e: s.find(e) for e in ents}


def test_stem_conflates_derivations():
    assert stem("performing") == stem("performed") == stem("performer")
    assert stem("recorded") == stem("recording") == stem("record")
    assert stem("founder") == stem("founded")
    assert stem("wedded") == "wed"


def test_lemma_relation_priority_label_over_release():
    hits = lemma_relation_hits(
        "The album was released in 1990 on the label X.")
    assert hits[0][0] == "released_on_label"
    assert any(r == "released_in" for r, _ in hits)


def test_lemma_extract_recording_by():
    s = "Velmi Horizon is a recording by Gorsen Tall."
    out = lemma_extract(s, ["Velmi Horizon", "Gorsen Tall"],
                        _pos(s, ["Velmi Horizon", "Gorsen Tall"]))
    assert out[0] == {"head_key": "Velmi Horizon", "rel": "performed_by",
                      "tail_key": "Gorsen Tall"}


def test_lemma_extract_open_verb_with_work_noun_and_by():
    s = "The album Kesden Mosaic was laid down by Gorsen Tall."
    ents = ["Kesden Mosaic", "Gorsen Tall"]
    out = lemma_extract(s, ents, _pos(s, ents))
    assert {"head_key": "Kesden Mosaic", "rel": "performed_by",
            "tail_key": "Gorsen Tall"} in out


def test_lemma_extract_label_not_performer():
    s = "The album Kesden Mosaic was released in 1990 by the label Tikes Sound."
    ents = ["Kesden Mosaic", "1990", "Tikes Sound"]
    out = lemma_extract(s, ents, _pos(s, ents))
    rels = {t["rel"]: t for t in out}
    assert rels["released_on_label"]["tail_key"] == "Tikes Sound"
    assert rels["released_in"]["tail_key"] == "1990"
    assert "performed_by" not in rels


def test_lemma_extract_negation_guard():
    s = "Delven Arc was never released in 1990."
    ents = ["Delven Arc", "1990"]
    assert lemma_extract(s, ents, _pos(s, ents)) == []


def test_normalize_question_preamble_and_synonyms():
    q = "Based on the passages: Which LP on the label Tiza Audio was released in the 1990s?"
    assert normalize_question(q) == (
        "Which album on the label Tiza Audio was released in the 1990s?")
    q2 = ("According to these paragraphs, Were the performers born in the "
          "same city?")
    assert normalize_question(q2) == (
        "Were the performers born in the same city?")
    q3 = "Which full-length release by Tosha was put out most recently?"
    assert normalize_question(q3) == (
        "Which album by Tosha was released most recently?")


def test_normalize_question_never_touches_entities():
    q = "Who performed The Record Sessions?"
    assert normalize_question(q) == q
    q2 = "When was Based On A True Story released?"   # entity mid-sentence
    assert normalize_question(q2) == q2
    assert normalize_question("Who founded LP Records?") == \
        "Who founded LP Records?"
    assert normalize_question("Which LP did Tosha release?") == \
        "Which album did Tosha release?"


def test_normalize_question_idempotent():
    q = "Based on the passages: Which LP was put out first?"
    once = normalize_question(q)
    assert normalize_question(once) == once
