"""Comparative-question exact math (answer/comparative.py) + the agentive
paraphrase cue ("artist behind" -> performed_by) in the rel-chain lexicon.

The reference answers comparative questions through LLM generation
(llm/prompts query_type classification); these tests cover the LLM-free
exact path and the v3 synthetic kinds 8/9 it exists for.
"""
from anorag_tpu.answer.answer_selector import extract_rel_chain, relation_cue_count
from anorag_tpu.answer.comparative import answer_comparative, parse_comparative
from anorag_tpu.graph.note_graph import NoteGraph


def test_parse_comparative_forms():
    p = parse_comparative("Which was released first, Blue Horizon or Red Steps?")
    assert p == {"options": ["Blue Horizon", "Red Steps"],
                 "verb": "released", "pick": "min"}
    p = parse_comparative("Which album was released most recently: Blue Horizon or Red Steps?")
    assert p["pick"] == "max" and p["options"] == ["Blue Horizon", "Red Steps"]
    p = parse_comparative("Which of Blue Horizon and Red Steps was released first?")
    assert p["pick"] == "min" and p["options"] == ["Blue Horizon", "Red Steps"]
    p = parse_comparative("Which label was founded earlier, Acme Records or Zen Sound?")
    assert p["verb"] == "founded" and p["pick"] == "min"


def test_parse_comparative_rejects_non_comparative():
    assert parse_comparative("Who is the spouse of the performer of Blue Horizon?") is None
    assert parse_comparative("When was Blue Horizon released?") is None
    assert parse_comparative("") is None


def _graph(year_a=1975, year_b=1990):
    g = NoteGraph()
    g.add_notes([
        {"note_id": "na", "content": f"Blue Horizon was released in {year_a}.",
         "head_key": "Blue Horizon", "rel": "released_in",
         "tail_key": str(year_a), "paragraph_idxs": [2]},
        {"note_id": "nb", "content": f"Red Steps was released in {year_b}.",
         "head_key": "Red Steps", "rel": "released_in",
         "tail_key": str(year_b), "paragraph_idxs": [5]},
    ])
    return g


def test_answer_comparative_graph_min_and_max():
    g = _graph()
    res = answer_comparative(
        "Which was released first, Blue Horizon or Red Steps?", g, [])
    assert res["answer"] == "Blue Horizon"
    assert set(res["support_idxs"]) == {2, 5}
    res = answer_comparative(
        "Which was released most recently, Blue Horizon or Red Steps?", g, [])
    assert res["answer"] == "Red Steps"


def test_answer_comparative_tie_and_unresolved_fall_through():
    assert answer_comparative(
        "Which was released first, Blue Horizon or Red Steps?",
        _graph(1980, 1980), []) is None          # tie: can't order
    assert answer_comparative(
        "Which was released first, Blue Horizon or Missing Album?",
        _graph(), []) is None                    # one option unresolved


def test_answer_comparative_head_key_case_and_suffix():
    """Question surfaces resolve case-insensitively and with a trailing
    parenthesized type suffix stripped (note key 'Blue Horizon' vs
    question 'Blue Horizon (album)')."""
    g = _graph()
    res = answer_comparative(
        "Which was released first, Blue Horizon (album) or RED STEPS?", g, [])
    assert res["answer"] == "Blue Horizon (album)"


def test_answer_comparative_candidate_fallback():
    """No graph triples: the year comes from a regex scan of the
    retrieved notes' sentences."""
    cands = [
        {"title": "Blue Horizon",
         "content": "Blue Horizon is an album. It was released in 1975.",
         "paragraph_idxs": [1]},
        {"title": "Red Steps",
         "content": "Red Steps was released in 1990 on Acme Records.",
         "paragraph_idxs": [3]},
    ]
    res = answer_comparative(
        "Which was released first, Blue Horizon or Red Steps?", None, cands)
    assert res["answer"] == "Blue Horizon"
    assert set(res["support_idxs"]) == {1, 3}


def test_artist_behind_paraphrase_chain():
    """v3 kind 9: 'artist behind' names performed_by outside any
    performance verb; the chain resolves performer first, born_in last."""
    q = "Which city is the birthplace of the artist behind Blue Horizon?"
    assert extract_rel_chain(q) == ["performed_by", "born_in"]
    assert relation_cue_count(q) == 2
    # the paraphrase must not fire on bare 'behind'
    assert extract_rel_chain("What is behind the house?") is None
