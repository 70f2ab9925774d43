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


# ---------------------------------------------------------- v4 aggregation
from anorag_tpu.answer.comparative import (
    answer_count,
    answer_exact_math,
    answer_superlative,
    answer_temporal_diff,
    answer_yesno,
)
from anorag_tpu.llm.note_generator import extract_note_keys


def _label_graph(entries, label="Tiden Records"):
    """Graph built through the PRODUCTION key extraction: one release
    sentence per work, keyed released_on_label with a released_in
    secondary edge."""
    g = NoteGraph()
    for i, (work, year) in enumerate(entries):
        text = f"{work} was released in {year} on the label {label}."
        keys = extract_note_keys(text, [work, str(year), label])
        g.add_notes([{"note_id": f"m{i}", "content": text, **keys,
                      "paragraph_idxs": [i]}])
    return g


def test_release_sentence_emits_secondary_released_in_edge():
    keys = extract_note_keys(
        "Holden Harbor was released in 1958 on the label Tiden Records.",
        ["Holden Harbor", "1958", "Tiden Records"])
    assert keys["rel"] == "released_on_label"
    assert keys["secondary_keys"] == [
        {"head_key": "Holden Harbor", "rel": "released_in",
         "tail_key": "1958"}]
    g = NoteGraph()
    g.add_notes([{"note_id": "n1", "content": "x was released.", **keys,
                  "paragraph_idxs": [7]}])
    rels = {r for r, *_ in g.neighbors("Holden Harbor")}
    assert rels == {"released_on_label", "released_in"}
    assert g.rheads("Tiden Records") == [
        ("released_on_label", "Holden Harbor", "n1")]


def test_temporal_diff():
    g = _graph(1975, 1990)
    res = answer_temporal_diff(
        "How many years after the release of Blue Horizon was Red Steps "
        "released?", g, [])
    assert res["answer"] == "15"
    assert set(res["support_idxs"]) == {2, 5}
    # ill-posed premise (B earlier than A) falls through
    assert answer_temporal_diff(
        "How many years after the release of Red Steps was Blue Horizon "
        "released?", g, []) is None


def test_yesno_polarity():
    g = _graph(1975, 1990)
    assert answer_yesno(
        "Was Blue Horizon released before Red Steps?", g, [])["answer"] == "yes"
    assert answer_yesno(
        "Was Blue Horizon released after Red Steps?", g, [])["answer"] == "no"
    assert answer_yesno(
        "Was Blue Horizon released before Red Steps?",
        _graph(1980, 1980), []) is None      # tie


def test_superlative_and_count_over_label_set():
    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    res = answer_superlative(
        "Which album on the label Tiden Records was released first?", g, [])
    assert res["answer"] == "Holden Harbor"
    assert set(res["support_idxs"]) == {0, 1, 2}
    res = answer_superlative(
        "Which album on the label Tiden Records was released most "
        "recently?", g, [])
    assert res["answer"] == "Linlin Garden"
    res = answer_count(
        "How many albums were released on the label Tiden Records?", g, [])
    assert res["answer"] == "3"
    # unknown label falls through
    assert answer_count(
        "How many albums were released on the label Ghost Label?", g, []) is None


def test_superlative_tied_extremum_falls_through():
    g = _label_graph([("A Harbor", 1958), ("B Garden", 1958),
                      ("C Steps", 1970)])
    assert answer_superlative(
        "Which album on the label Tiden Records was released first?",
        g, []) is None


def test_exact_math_dispatcher_routes_all_families():
    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970)])
    cases = [
        ("Which was released first, Holden Harbor or Linlin Garden?",
         "Holden Harbor", "comparative"),
        ("How many years after the release of Holden Harbor was "
         "Linlin Garden released?", "12", "temporal_diff"),
        ("Was Holden Harbor released before Linlin Garden?", "yes", "yesno"),
        ("Which album on the label Tiden Records was released first?",
         "Holden Harbor", "superlative"),
        ("How many albums were released on the label Tiden Records?",
         "2", "count"),
    ]
    for q, want, method in cases:
        res = answer_exact_math(q, g, [])
        assert res and res["answer"] == want and res["method"] == method, (q, res)
    assert answer_exact_math("Who performed Holden Harbor?", g, []) is None


def test_ordinal_over_label_set():
    """v8 kind 15: 'the second album released on the label L' sorts the
    label's works by year and takes index 1 (ascending; 'second most
    recent' descends)."""
    from anorag_tpu.answer.comparative import answer_ordinal

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    res = answer_ordinal(
        "What was the second album released on the label Tiden Records?",
        g, [])
    assert res["answer"] == "Denon Harbor" and res["method"] == "ordinal"
    assert set(res["support_idxs"]) == {0, 1, 2}
    res = answer_ordinal(
        "Which was the second most recent album released on the label "
        "Tiden Records?", g, [])
    assert res["answer"] == "Denon Harbor"
    res = answer_ordinal(
        "What was the third album released on the label Tiden Records?",
        g, [])
    assert res["answer"] == "Linlin Garden"
    # out-of-range ordinal and non-ordinal questions fall through
    assert answer_ordinal(
        "What was the fifth album released on the label Tiden Records?",
        g, []) is None
    assert answer_ordinal(
        "Which album on the label Tiden Records was released first?",
        g, []) is None


def test_label_intersection():
    """v8 kind 14: the LABEL is the answer, reached by intersecting two
    works' released-on edges; ambiguous/empty intersections fall through."""
    from anorag_tpu.answer.comparative import answer_label_intersection

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970)])
    # a third work on a DIFFERENT label: not in the intersection
    g2 = _label_graph([("Miza Steps", 1980)], label="Corba Sound")
    for nid, n in g2.notes.items():
        g.add_notes([dict(n, note_id=f"x{nid}")])
    res = answer_label_intersection(
        "Which record label released both Holden Harbor and Linlin Garden?",
        g, [])
    assert res["answer"] == "Tiden Records"
    assert res["method"] == "label_intersection"
    assert set(res["support_idxs"]) == {0, 1}
    # no common label -> fall through
    assert answer_label_intersection(
        "Which record label released both Holden Harbor and Miza Steps?",
        g, []) is None


def test_originally_released_chain():
    """v8 kind 17: 'the label that ORIGINALLY released W' still parses as
    the released_on_label hop (adverb between pronoun and verb), and the
    reissue sentence must not forge a released_on_label edge."""
    chain = extract_rel_chain(
        "Who founded the label that originally released Lura River?")
    assert chain == ["released_on_label", "founded_by"], chain
    from anorag_tpu.llm.note_generator import extract_note_keys
    keys = extract_note_keys(
        "It was reissued in 1979 by Bato Sound.",
        ["It", "1979", "Bato Sound"])
    assert keys.get("rel") != "released_on_label"
    keys = extract_note_keys(
        "A remastered edition was issued by Bato Sound in 1999.",
        ["Bato Sound", "1999"])
    assert keys.get("rel") != "released_on_label"


def test_stage_name_alias_resolution():
    """v8 kind 16: 'P, known professionally as S' re-keys S-credited facts
    under the real name (non-initial alias class, unlike v7 initials)."""
    from anorag_tpu.llm.note_generator import resolve_note_abbreviations

    notes = [
        {"text": "Marralin Toluhol, known professionally as Corfen "
                 "Onpriza, is a musician.",
         "entities": ["Marralin Toluhol", "Corfen Onpriza"]},
        {"text": "Toti River is an album by Corfen Onpriza.",
         "entities": ["Toti River", "Corfen Onpriza"],
         "head_key": "Toti River", "rel": "performed_by",
         "tail_key": "Corfen Onpriza"},
    ]
    resolve_note_abbreviations(notes)
    assert notes[1]["tail_key"] == "Marralin Toluhol"
    assert "Marralin Toluhol" in notes[1]["entities"]
    assert "Corfen Onpriza" in notes[1]["entities"]


def test_decade_membership():
    """v9 kind 19: exactly one of the label's works falls in the asked
    decade; zero or several fall through."""
    from anorag_tpu.answer.comparative import answer_decade

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1972),
                      ("Denon Harbor", 1966)])
    res = answer_decade(
        "Which album on the label Tiden Records was released in the "
        "1970s?", g, [])
    assert res["answer"] == "Linlin Garden" and res["method"] == "decade"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # no work in the 1980s -> fall through
    assert answer_decade(
        "Which album on the label Tiden Records was released in the "
        "1980s?", g, []) is None
    # two works in the 1960s -> ambiguous, fall through
    g2 = _label_graph([("A Steps", 1961), ("B Steps", 1968)])
    assert answer_decade(
        "Which album on the label Tiden Records was released in the "
        "1960s?", g2, []) is None


def test_conjunctive_constraint():
    """v9 kind 18: both constraints (performer AND label) must bind —
    single-constraint foils are in the graph."""
    from anorag_tpu.answer.comparative import answer_conjunctive

    g = NoteGraph()
    g.add_notes([
        # the answer: by P, on L
        {"note_id": "n0", "content": "Miti Echo ...",
         "head_key": "Miti Echo", "rel": "performed_by",
         "tail_key": "Nefen Corongor", "paragraph_idxs": [0],
         "secondary_keys": [{"head_key": "Miti Echo",
                             "rel": "released_on_label",
                             "tail_key": "Vellin Disc"}]},
        # foil 1: on L, by someone else
        {"note_id": "n1", "content": "Priza Summit ...",
         "head_key": "Priza Summit", "rel": "performed_by",
         "tail_key": "Other Artist", "paragraph_idxs": [1],
         "secondary_keys": [{"head_key": "Priza Summit",
                             "rel": "released_on_label",
                             "tail_key": "Vellin Disc"}]},
        # foil 2: by P, on another label
        {"note_id": "n2", "content": "Marpri Signal ...",
         "head_key": "Marpri Signal", "rel": "performed_by",
         "tail_key": "Nefen Corongor", "paragraph_idxs": [2],
         "secondary_keys": [{"head_key": "Marpri Signal",
                             "rel": "released_on_label",
                             "tail_key": "Gorto Audio"}]},
    ])
    res = answer_conjunctive(
        "Which album by Nefen Corongor was released on the label "
        "Vellin Disc?", g, [])
    assert res["answer"] == "Miti Echo"
    assert res["method"] == "conjunctive"
    assert answer_conjunctive(
        "Which album by Nefen Corongor was released on the label "
        "Missing Records?", g, []) is None


def test_bridged_comparative_option():
    """v9 kind 20: 'the album performed by P' resolves through the
    reverse performed_by edge before the year comparison; the ANSWER is
    the resolved title."""
    g = NoteGraph()
    g.add_notes([
        {"note_id": "n0", "content": "Vellin Summit ...",
         "head_key": "Vellin Summit", "rel": "released_in",
         "tail_key": "2004", "paragraph_idxs": [0]},
        {"note_id": "n1", "content": "Fenne River ...",
         "head_key": "Fenne River", "rel": "performed_by",
         "tail_key": "Kesrato Titi", "paragraph_idxs": [1],
         "secondary_keys": [{"head_key": "Fenne River",
                             "rel": "released_in", "tail_key": "2006"}]},
    ])
    res = answer_comparative(
        "Which was released first, Vellin Summit or the album performed "
        "by Kesrato Titi?", g, [])
    assert res["answer"] == "Vellin Summit"
    # the resolved option wins when earlier
    res = answer_comparative(
        "Which was released most recently, Vellin Summit or the album "
        "performed by Kesrato Titi?", g, [])
    assert res["answer"] == "Fenne River"


def test_same_city_cross_chain():
    """v9 kind 21: two performer->born_in chains compared for identity;
    the long 'City, State' surface normalizes."""
    from anorag_tpu.answer.comparative import answer_same_attribute

    def _world(nid, work, person, city):
        return [
            {"note_id": f"{nid}a", "content": f"{work} ...",
             "head_key": work, "rel": "performed_by", "tail_key": person,
             "paragraph_idxs": [int(nid)]},
            {"note_id": f"{nid}b", "content": f"{person} ...",
             "head_key": person, "rel": "born_in", "tail_key": city,
             "paragraph_idxs": [int(nid) + 10]},
        ]

    g = NoteGraph()
    g.add_notes(_world("0", "Toon Summit", "Vellu Shalin", "Portland")
                + _world("1", "Luto Garden", "Tone Rane",
                         "Portland, Oregon"))
    res = answer_same_attribute(
        "Were the performer of Toon Summit and the performer of "
        "Luto Garden born in the same city?", g, [])
    assert res["answer"] == "yes" and res["method"] == "same_attribute"
    assert set(res["support_idxs"]) == {0, 10, 1, 11}
    g2 = NoteGraph()
    g2.add_notes(_world("0", "Toon Summit", "Vellu Shalin", "Portland")
                 + _world("1", "Luto Garden", "Tone Rane", "Boston"))
    res = answer_same_attribute(
        "Were the performer of Toon Summit and the performer of "
        "Luto Garden born in the same city?", g2, [])
    assert res["answer"] == "no"


def test_word_boundary_entity_positions():
    """A 2-letter alias ('BA') must not phantom-match inside another
    token ('Balu'): before the fix, 'Denbahol Balu established BA'
    keyed Denbahol founded_by BA (inversion corrupted) and the spouse
    sentence picked BA as its tail."""
    from anorag_tpu.llm.note_generator import extract_all_note_keys

    k = extract_all_note_keys(
        "Denbahol Balu founded BA. The spouse of Denbahol Balu is "
        "Shaden Tilu.", ["Denbahol Balu", "BA", "Shaden Tilu"])
    triples = {(k["head_key"], k["rel"], k["tail_key"])} | {
        (s["head_key"], s["rel"], s["tail_key"])
        for s in k.get("secondary_keys") or ()}
    assert ("BA", "founded_by", "Denbahol Balu") in triples
    assert ("Denbahol Balu", "spouse_of", "Shaden Tilu") in triples


def test_performer_set_superlative():
    """v10 kind 22: the set anchor is a PERFORMER (reverse performed_by),
    not a label."""
    g = NoteGraph()
    for i, (work, year, label) in enumerate(
            [("Toti Garden", 2013, "Velkes Sound"),
             ("Corlin Harbor", 2008, "Nekes Music"),
             ("Kesvel Origins", 1977, "Prihol Music")]):
        g.add_notes([{
            "note_id": f"p{i}", "content": f"{work} ...",
            "head_key": work, "rel": "performed_by",
            "tail_key": "Gorkes Zamimar", "paragraph_idxs": [i],
            "secondary_keys": [
                {"head_key": work, "rel": "released_on_label",
                 "tail_key": label},
                {"head_key": work, "rel": "released_in",
                 "tail_key": str(year)}]}])
    res = answer_superlative(
        "Which album by Gorkes Zamimar was released first?", g, [])
    assert res["answer"] == "Kesvel Origins"
    res = answer_superlative(
        "Which album by Gorkes Zamimar was released most recently?", g, [])
    assert res["answer"] == "Toti Garden"


def test_filtered_count():
    """v10 kind 23: cardinality after a decade filter; an unresolvable
    year makes the count unsafe (fall through)."""
    from anorag_tpu.answer.comparative import answer_count_filtered

    g = _label_graph([("A Steps", 2001), ("B Steps", 2006),
                      ("C Steps", 1964), ("D Steps", 1991)])
    res = answer_count_filtered(
        "How many albums on the label Tiden Records were released in "
        "the 2000s?", g, [])
    assert res["answer"] == "2" and res["method"] == "count_filtered"
    assert set(res["support_idxs"]) == {0, 1, 2, 3}
    res = answer_count_filtered(
        "How many albums on the label Tiden Records were released in "
        "the 1980s?", g, [])
    assert res["answer"] == "0"
    # plain unfiltered count still routes to answer_count
    assert answer_count_filtered(
        "How many albums were released on the label Tiden Records?",
        g, []) is None


def test_nested_anchor_temporal_diff():
    """v10 kind 24: 'the first album on the label L' resolves through the
    superlative before the year subtraction."""
    g = _label_graph([("Luto Garden", 1962), ("Fenba Origins", 1944),
                      ("Denra Horizon", 1951)])
    res = answer_temporal_diff(
        "How many years after the release of the first album on the "
        "label Tiden Records was Luto Garden released?", g, [])
    assert res["answer"] == "18"
    assert set(res["support_idxs"]) == {0, 1, 2}


def test_negated_conjunctive():
    """v10 kind 25: 'was NOT released on L' takes the set difference; the
    on-L works by the same performer are part of the proof."""
    from anorag_tpu.answer.comparative import answer_conjunctive

    g = NoteGraph()
    g.add_notes([
        {"note_id": "n0", "content": "Nepri Echo ...",
         "head_key": "Nepri Echo", "rel": "performed_by",
         "tail_key": "Baluba Prizara", "paragraph_idxs": [0],
         "secondary_keys": [{"head_key": "Nepri Echo",
                             "rel": "released_on_label",
                             "tail_key": "Velgor Audio"}]},
        {"note_id": "n1", "content": "Shalu River ...",
         "head_key": "Shalu River", "rel": "performed_by",
         "tail_key": "Baluba Prizara", "paragraph_idxs": [1],
         "secondary_keys": [{"head_key": "Shalu River",
                             "rel": "released_on_label",
                             "tail_key": "Timi Music"}]},
    ])
    res = answer_conjunctive(
        "Which album by Baluba Prizara was not released on the label "
        "Velgor Audio?", g, [])
    assert res["answer"] == "Shalu River"
    assert set(res["support_idxs"]) == {0, 1}
    # the positive form still intersects
    res = answer_conjunctive(
        "Which album by Baluba Prizara was released on the label "
        "Velgor Audio?", g, [])
    assert res["answer"] == "Nepri Echo"


def test_years_apart_unordered():
    """v11 kind 27: absolute difference, no direction."""
    from anorag_tpu.answer.comparative import answer_years_apart

    g = _graph(1975, 1990)
    res = answer_years_apart(
        "How many years apart were Blue Horizon and Red Steps released?",
        g, [])
    assert res["answer"] == "15"
    res = answer_years_apart(
        "How many years apart were Red Steps and Blue Horizon released?",
        g, [])
    assert res["answer"] == "15"        # order-insensitive
    assert answer_years_apart(
        "How many years after the release of Blue Horizon was Red Steps "
        "released?", g, []) is None     # directed form routes elsewhere


def test_count_comparative():
    """v11 kind 28: compare two set cardinalities; ties fall through."""
    from anorag_tpu.answer.comparative import answer_count_comparative

    g = _label_graph([("A Steps", 1961), ("B Steps", 1968)])
    g2 = _label_graph([("C Steps", 1970)], label="Bara Audio")
    for nid, n in g2.notes.items():
        g.add_notes([dict(n, note_id=f"x{nid}")])
    res = answer_count_comparative(
        "Which label released more albums, Tiden Records or Bara Audio?",
        g, [])
    assert res["answer"] == "Tiden Records"
    res = answer_count_comparative(
        "Which label released fewer albums, Tiden Records or Bara Audio?",
        g, [])
    assert res["answer"] == "Bara Audio"
    # tie falls through
    g3 = _label_graph([("D Steps", 1980)], label="Tie One")
    g4 = _label_graph([("E Steps", 1981)], label="Tie Two")
    for nid, n in g4.notes.items():
        g3.add_notes([dict(n, note_id=f"y{nid}")])
    assert answer_count_comparative(
        "Which label released more albums, Tie One or Tie Two?",
        g3, []) is None


def test_closest_release():
    """v11 kind 29: argmin |year - anchor| with the anchor excluded."""
    from anorag_tpu.answer.comparative import answer_closest_release

    g = _label_graph([("Kesto Harbor", 1968), ("Mihol Horizon", 1953),
                      ("Neden Harbor", 1954)])
    res = answer_closest_release(
        "Which album on the label Tiden Records was released closest to "
        "Kesto Harbor?", g, [])
    assert res["answer"] == "Neden Harbor"      # 14 < 15; anchor excluded
    assert res["method"] == "closest_release"
    # tied distances fall through
    g2 = _label_graph([("A Steps", 1970), ("B Steps", 1965),
                       ("C Steps", 1975)])
    assert answer_closest_release(
        "Which album on the label Tiden Records was released closest to "
        "A Steps?", g2, []) is None


def test_inverse_hop_anchor_chain():
    """v11 kind 26: the chain anchors at a performer whose first hop runs
    AGAINST the stored performed_by edge; support canonicalizes to the
    right home paragraphs."""
    from anorag_tpu.answer.answer_selector import answer_question

    g = NoteGraph()
    g.add_notes([
        {"note_id": "w0", "content": "Lugor Steps is an album by Holonvel "
                                     "Tivelon. It was put out in 1963 by "
                                     "the label Bapri Sound.",
         "head_key": "Lugor Steps", "rel": "performed_by",
         "tail_key": "Holonvel Tivelon", "paragraph_idxs": [0],
         "secondary_keys": [{"head_key": "Lugor Steps",
                             "rel": "released_on_label",
                             "tail_key": "Bapri Sound"}]},
        {"note_id": "l0", "content": "Bapri Sound is a record label. "
                                     "Bapri Sound was started by Tone "
                                     "Tilin.",
         "head_key": "Bapri Sound", "rel": "founded_by",
         "tail_key": "Tone Tilin", "paragraph_idxs": [3]},
        {"note_id": "f0", "content": "Tone Tilin founded Bapri Sound. The "
                                     "spouse of Tone Tilin is Fencorcor "
                                     "Rakes.",
         "head_key": "Tone Tilin", "rel": "spouse_of",
         "tail_key": "Fencorcor Rakes", "paragraph_idxs": [4]},
    ])
    res = answer_question(
        "Who is the spouse of the founder of the label that released the "
        "album performed by Holonvel Tivelon?", g)
    assert res and res["answer"] == "Fencorcor Rakes"
    assert res["relations"] == ["performed_by", "released_on_label",
                                "founded_by", "spouse_of"]


def test_spouse_at_time():
    """v12 kind 30: temporal join of marriage/divorce events against the
    work's release year; events may span separate notes."""
    from anorag_tpu.answer.comparative import answer_spouse_at_time

    g = _graph(1989, 1990)   # Blue Horizon released 1989
    cands = [
        {"title": "P", "paragraph_idxs": [1],
         "content": "Corcor Luprilin married Kestira Cordenkes in 1978. "
                    "Corcor Luprilin and Kestira Cordenkes divorced in "
                    "1983. Corcor Luprilin married Privel Zagor in 1985."},
    ]
    res = answer_spouse_at_time(
        "Who was the spouse of Corcor Luprilin at the time Blue Horizon "
        "was released?", g, cands)
    assert res["answer"] == "Privel Zagor"
    assert res["method"] == "spouse_at_time"
    assert set(res["support_idxs"]) == {1, 2}
    # release year inside the FIRST marriage
    g2 = _graph(1980, 1990)
    res = answer_spouse_at_time(
        "Who was the spouse of Corcor Luprilin at the time Blue Horizon "
        "was released?", g2, cands)
    assert res["answer"] == "Kestira Cordenkes"
    # events split across notes still join
    split = [
        {"title": "P", "paragraph_idxs": [1],
         "content": "Corcor Luprilin married Kestira Cordenkes in 1978."},
        {"title": "P", "paragraph_idxs": [1],
         "content": "Corcor Luprilin and Kestira Cordenkes divorced in "
                    "1983."},
        {"title": "P", "paragraph_idxs": [1],
         "content": "Corcor Luprilin married Privel Zagor in 1985."},
    ]
    res = answer_spouse_at_time(
        "Who was the spouse of Corcor Luprilin at the time Blue Horizon "
        "was released?", g, split)
    assert res["answer"] == "Privel Zagor"


def test_attr_comparative_tracks():
    """v12 kind 31: number-word track counts compared across works."""
    from anorag_tpu.answer.comparative import answer_attr_comparative

    cands = [
        {"title": "Zane River (album)", "paragraph_idxs": [4],
         "content": "Zane River is an album. It features ten tracks."},
        {"title": "Zaza Garden (album)", "paragraph_idxs": [7],
         "content": "Zaza Garden is an album. It contains three tracks."},
    ]
    res = answer_attr_comparative(
        "Which album has more tracks, Zane River or Zaza Garden?",
        None, cands)
    assert res["answer"] == "Zane River"
    assert set(res["support_idxs"]) == {4, 7}
    res = answer_attr_comparative(
        "Which album has fewer tracks, Zane River or Zaza Garden?",
        None, cands)
    assert res["answer"] == "Zaza Garden"
    # tie falls through
    tie = [dict(cands[0]), {"title": "Zaza Garden (album)",
                            "paragraph_idxs": [7],
                            "content": "Zaza Garden has ten tracks."}]
    assert answer_attr_comparative(
        "Which album has more tracks, Zane River or Zaza Garden?",
        None, tie) is None


def test_state_coercion():
    """v12 kind 32: a 'which state' answer that resolved to a city takes
    one more hop — comma surface, located_in edge, or evidence sentence."""
    from anorag_tpu.answer.comparative import coerce_state_answer

    # comma surface
    ans, sup = coerce_state_answer(
        "In which state was the performer born?", "Austin, Texas", None, [])
    assert ans == "Texas" and sup == []
    # located_in edge
    g = NoteGraph()
    g.add_notes([{"note_id": "geo", "content": "Austin is a city in the "
                                               "state of Texas.",
                  "head_key": "Austin", "rel": "located_in",
                  "tail_key": "Texas", "paragraph_idxs": [9]}])
    ans, sup = coerce_state_answer(
        "In which state was the performer born?", "Austin", g, [])
    assert ans == "Texas" and sup == [9]
    # evidence-sentence fallback
    cands = [{"title": "Austin", "paragraph_idxs": [5],
              "content": "Austin is a city in the state of Texas."}]
    ans, sup = coerce_state_answer(
        "In which state was the performer born?", "Austin", None, cands)
    assert ans == "Texas" and sup == [5]
    # non-state questions pass through untouched
    ans, sup = coerce_state_answer(
        "Where was the performer born?", "Austin", g, [])
    assert ans == "Austin"


# ----------------------------------------------------------------- v14
def test_superlative_hop_resolves_performer_of_extremum():
    """v14 kind 38: the superlative picks the work, then the answer is
    that work's PERFORMER — a hop on the superlative's output."""
    from anorag_tpu.answer.comparative import answer_superlative_hop

    g = NoteGraph()
    for i, (work, year, person) in enumerate(
            [("Holden Harbor", 1958, "Mira Vel"),
             ("Linlin Garden", 1970, "Kesto Ra"),
             ("Denon Harbor", 1966, "Bdone Sha")]):
        rel = f"{work} was released in {year} on the label Tiden Records."
        keys = extract_note_keys(rel, [work, str(year), "Tiden Records"])
        g.add_notes([{"note_id": f"r{i}", "content": rel, **keys,
                      "paragraph_idxs": [i]}])
        per = f"{work} is an album performed by {person}."
        pkeys = extract_note_keys(per, [work, person])
        g.add_notes([{"note_id": f"p{i}", "content": per, **pkeys,
                      "paragraph_idxs": [i]}])
    res = answer_superlative_hop(
        "Who performed the first album released on the label "
        "Tiden Records?", g, [])
    assert res["answer"] == "Mira Vel"
    assert 0 in res["support_idxs"]
    res = answer_superlative_hop(
        "Who performed the last album released on the label "
        "Tiden Records?", g, [])
    assert res["answer"] == "Kesto Ra"
    # the plain superlative (which-question) must not route here
    assert answer_superlative_hop(
        "Which album on the label Tiden Records was released first?",
        g, []) is None


def test_attr_difference_word_numbers():
    """v14 kind 39: subtraction over word-number track counts; the
    answer is a number stated in no paragraph."""
    from anorag_tpu.answer.comparative import answer_attr_difference

    cands = [
        {"title": "Kesfen Harbor (album)", "paragraph_idxs": [1],
         "content": "Kesfen Harbor is an album. It features sixteen "
                    "tracks."},
        {"title": "Tiza Harbor (album)", "paragraph_idxs": [4],
         "content": "Tiza Harbor is an album. It contains two tracks."},
    ]
    res = answer_attr_difference(
        "How many more tracks does Kesfen Harbor have than Tiza Harbor?",
        None, cands)
    assert res["answer"] == "14"
    assert set(res["support_idxs"]) == {1, 4}
    # ill-posed premise (A has fewer) falls through
    assert answer_attr_difference(
        "How many more tracks does Tiza Harbor have than Kesfen Harbor?",
        None, cands) is None
    # 'fewer' inverts the subtraction
    res = answer_attr_difference(
        "How many fewer tracks does Tiza Harbor have than Kesfen Harbor?",
        None, cands)
    assert res["answer"] == "14"


def test_year_range_over_label_set():
    """v14 kind 40: first-to-last distance needs BOTH extrema resolved
    from the set, then subtracted."""
    from anorag_tpu.answer.comparative import answer_year_range

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    res = answer_year_range(
        "How many years apart were the first and the last albums "
        "released on the label Tiden Records?", g, [])
    assert res["answer"] == "12"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # unknown label falls through
    assert answer_year_range(
        "How many years apart were the first and the last albums "
        "released on the label Ghost Records?", g, []) is None


def test_forall_decade_quantification():
    """v14 kind 41: forall over the label set; a single out-of-decade
    counterexample flips the polarity."""
    from anorag_tpu.answer.comparative import answer_forall_decade

    g_yes = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1995),
                          ("Denon Harbor", 1999)])
    res = answer_forall_decade(
        "Were all of the albums on the label Tiden Records released in "
        "the 1990s?", g_yes, [])
    assert res["answer"] == "yes"
    assert set(res["support_idxs"]) == {0, 1, 2}
    g_no = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1985),
                         ("Denon Harbor", 1999)])
    res = answer_forall_decade(
        "Were all of the albums on the label Tiden Records released in "
        "the 1990s?", g_no, [])
    assert res["answer"] == "no"


def test_geography_cue_yields_located_in_key():
    """Regression (v14 close): the CONFIG lexicon lacked the geography
    cues the module default carried, so production KBs keyed geography
    sentences related_to and the same-state coercion had no edge."""
    from anorag_tpu.config.defaults import DEFAULT_CONFIG

    lex = DEFAULT_CONFIG["note_keys"]["rel_lexicon"]
    keys = extract_note_keys("Salem is a city in the state of Oregon.",
                             ["Salem", "Oregon"], rel_lexicon=lex)
    assert keys == {"head_key": "Salem", "rel": "located_in",
                    "tail_key": "Oregon"}


# ----------------------------------------------------------------- v15
def _label_graph_with_performers(entries, label="Tiden Records"):
    """Label set whose members also carry performed_by edges."""
    g = NoteGraph()
    for i, (work, year, person) in enumerate(entries):
        rel = f"{work} was released in {year} on the label {label}."
        keys = extract_note_keys(rel, [work, str(year), label])
        g.add_notes([{"note_id": f"r{i}", "content": rel, **keys,
                      "paragraph_idxs": [i]}])
        per = f"{work} is an album performed by {person}."
        pkeys = extract_note_keys(per, [work, person])
        g.add_notes([{"note_id": f"p{i}", "content": per, **pkeys,
                      "paragraph_idxs": [i]}])
    return g


def test_member_year_hop():
    """v15 kind 42: select the set member by YEAR EQUALITY, then hop
    performed_by on it; support covers the whole enumerated set."""
    from anorag_tpu.answer.comparative import answer_member_year_hop

    g = _label_graph_with_performers(
        [("Holden Harbor", 1958, "Mira Vel"),
         ("Linlin Garden", 1970, "Kesto Ra"),
         ("Denon Harbor", 1966, "Bdone Sha")])
    res = answer_member_year_hop(
        "Who performed the album released on the label Tiden Records "
        "in 1970?", g, [])
    assert res["answer"] == "Kesto Ra"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # a year matching NO member falls through
    assert answer_member_year_hop(
        "Who performed the album released on the label Tiden Records "
        "in 1999?", g, []) is None


def test_attr_superlative_over_label_set():
    """v15 kind 43: argmax over word-number track counts carried by
    every member paragraph; an incomplete count set falls through."""
    from anorag_tpu.answer.comparative import answer_attr_superlative

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_attr_superlative(
        "Which album on the label Tiden Records has the most tracks?",
        g, cands)
    assert res["answer"] == "Linlin Garden"
    assert set(res["support_idxs"]) == {0, 1, 2}
    res = answer_attr_superlative(
        "Which album on the label Tiden Records has the fewest tracks?",
        g, cands)
    assert res["answer"] == "Holden Harbor"
    # a member without a stated count makes the argmax unsound
    assert answer_attr_superlative(
        "Which album on the label Tiden Records has the most tracks?",
        g, cands[:2]) is None


def test_exists_decade_quantification():
    """v15 kind 44: existential dual of the forall stage."""
    from anorag_tpu.answer.comparative import answer_exists_decade

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1972),
                      ("Denon Harbor", 1966)])
    res = answer_exists_decade(
        "Did any album on the label Tiden Records come out in the "
        "1970s?", g, [])
    assert res["answer"] == "yes"
    res = answer_exists_decade(
        "Did any album on the label Tiden Records come out in the "
        "1990s?", g, [])
    assert res["answer"] == "no"
    assert set(res["support_idxs"]) == {0, 1, 2}


def test_same_label_equality():
    """v15 kind 45: attribute equality on WORKS via released_on_label
    edges; either side unresolved falls through."""
    from anorag_tpu.answer.comparative import answer_same_label

    g = NoteGraph()
    for i, (work, label) in enumerate(
            [("Holden Harbor", "Tiden Records"),
             ("Linlin Garden", "Tiden Records"),
             ("Denon Harbor", "Velpri Sound")]):
        text = f"{work} was released in 1980 on the label {label}."
        keys = extract_note_keys(text, [work, "1980", label])
        g.add_notes([{"note_id": f"n{i}", "content": text, **keys,
                      "paragraph_idxs": [i]}])
    res = answer_same_label(
        "Were Holden Harbor and Linlin Garden released on the same "
        "label?", g, [])
    assert res["answer"] == "yes"
    assert set(res["support_idxs"]) == {0, 1}
    res = answer_same_label(
        "Were Holden Harbor and Denon Harbor released on the same "
        "label?", g, [])
    assert res["answer"] == "no"
    assert answer_same_label(
        "Were Holden Harbor and Ghost Album released on the same "
        "label?", g, []) is None


# ----------------------------------------------------------------- v16
def test_superlative_hop2_two_hops():
    """v16 kind 46: superlative -> performed_by -> born_in."""
    from anorag_tpu.answer.comparative import answer_superlative_hop2

    g = _label_graph_with_performers(
        [("Holden Harbor", 1958, "Mira Vel"),
         ("Linlin Garden", 1970, "Kesto Ra"),
         ("Denon Harbor", 1966, "Bdone Sha")])
    born = "Kesto Ra was born in Denver."
    keys = extract_note_keys(born, ["Kesto Ra", "Denver"])
    g.add_notes([{"note_id": "b1", "content": born, **keys,
                  "paragraph_idxs": [7]}])
    res = answer_superlative_hop2(
        "Where was the performer of the last album released on the "
        "label Tiden Records born?", g, [])
    assert res["answer"] == "Denver"
    assert 7 in res["support_idxs"]
    # missing birth fact for the resolved performer falls through
    assert answer_superlative_hop2(
        "Where was the performer of the first album released on the "
        "label Tiden Records born?", g, []) is None


def test_label_of_performer_superlative():
    """v16 kind 47: the set anchors on a PERFORMER; the answer is the
    resolved member's label."""
    from anorag_tpu.answer.comparative import answer_label_of_superlative

    g = NoteGraph()
    for i, (work, year, label) in enumerate(
            [("Holden Harbor", 1958, "Tiden Records"),
             ("Linlin Garden", 1970, "Velpri Sound"),
             ("Denon Harbor", 1966, "Kesto Audio")]):
        rel = f"{work} was released in {year} on the label {label}."
        keys = extract_note_keys(rel, [work, str(year), label])
        g.add_notes([{"note_id": f"r{i}", "content": rel, **keys,
                      "paragraph_idxs": [i]}])
        per = f"{work} is an album by Mira Vel."
        pkeys = extract_note_keys(per, [work, "Mira Vel"])
        g.add_notes([{"note_id": f"p{i}", "content": per, **pkeys,
                      "paragraph_idxs": [i]}])
    res = answer_label_of_superlative(
        "Which label released the first album by Mira Vel?", g, [])
    assert res["answer"] == "Tiden Records"
    res = answer_label_of_superlative(
        "Which label released the last album by Mira Vel?", g, [])
    assert res["answer"] == "Velpri Sound"


def test_attr_sum_over_label_set():
    """v16 kind 48: SUM of word-number counts; incomplete set falls
    through."""
    from anorag_tpu.answer.comparative import answer_attr_sum

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_attr_sum(
        "How many tracks do the albums on the label Tiden Records have "
        "in total?", g, cands)
    assert res["answer"] == "29"
    assert set(res["support_idxs"]) == {0, 1, 2}
    assert answer_attr_sum(
        "How many tracks do the albums on the label Tiden Records have "
        "in total?", g, cands[:2]) is None


def test_interval_membership():
    """v17 kind 51: two-sided inclusive year window over the label's
    works; zero or several members inside fall through."""
    from anorag_tpu.answer.comparative import answer_interval

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1972),
                      ("Denon Harbor", 1966)])
    res = answer_interval(
        "Which album on the label Tiden Records was released between "
        "1970 and 1975?", g, [])
    assert res["answer"] == "Linlin Garden" and res["method"] == "interval"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # inclusive bounds: [1972, 1980] contains exactly Linlin Garden
    res = answer_interval(
        "Which album on the label Tiden Records was released between "
        "1972 and 1980?", g, [])
    assert res["answer"] == "Linlin Garden"
    # two members inside -> ambiguous; none inside -> fall through
    assert answer_interval(
        "Which album on the label Tiden Records was released between "
        "1950 and 1970?", g, []) is None
    assert answer_interval(
        "Which album on the label Tiden Records was released between "
        "1990 and 1995?", g, []) is None
    # inverted window is ill-posed
    assert answer_interval(
        "Which album on the label Tiden Records was released between "
        "1975 and 1970?", g, []) is None


def test_count_threshold():
    """v17 kind 52: cardinality after a word-number attribute threshold;
    a member without a stated count makes it unsound."""
    from anorag_tpu.answer.comparative import answer_count_threshold

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have more than six "
        "tracks?", g, cands)
    assert res["answer"] == "2" and res["method"] == "count_threshold"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # digit threshold + the 'fewer' direction
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have fewer than 7 "
        "tracks?", g, cands)
    assert res["answer"] == "1"
    # strict inequality: 'more than nineteen' excludes the 19-track album
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have more than "
        "nineteen tracks?", g, cands)
    assert res["answer"] == "0"
    # a member without a count -> unsound
    assert answer_count_threshold(
        "How many albums on the label Tiden Records have more than six "
        "tracks?", g, cands[:2]) is None


def test_member_year_born_three_step():
    """v17 kind 50: year-equality member selection -> performed_by ->
    born_in; the selection proof cites every member's year fact."""
    from anorag_tpu.answer.comparative import answer_member_year_born

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1972),
                      ("Denon Harbor", 1966)])
    for i, (work, person) in enumerate(
            [("Holden Harbor", "Mira Vel"), ("Linlin Garden", "Tane Bo"),
             ("Denon Harbor", "Rolu Kas")]):
        text = f"{work} is an album performed by {person}."
        keys = extract_note_keys(text, [work, person])
        g.add_notes([{"note_id": f"p{i}", "content": text, **keys,
                      "paragraph_idxs": [3 + i]}])
    text = "Tane Bo was born in Boston."
    keys = extract_note_keys(text, ["Tane Bo", "Boston"])
    g.add_notes([{"note_id": "b0", "content": text, **keys,
                  "paragraph_idxs": [9]}])
    res = answer_member_year_born(
        "Where was the performer of the album released on the label "
        "Tiden Records in 1972 born?", g, [])
    assert res["answer"] == "Boston" and res["method"] == "member_year_born"
    assert set(res["support_idxs"]) == {0, 1, 2, 4, 9}
    # no member in the asked year -> fall through
    assert answer_member_year_born(
        "Where was the performer of the album released on the label "
        "Tiden Records in 1980 born?", g, []) is None


def test_attr_threshold_which():
    """v18 kind 55: the threshold filter as a SELECTION — exactly one
    member above the cut; ties/ambiguity and missing counts fall
    through."""
    from anorag_tpu.answer.comparative import answer_attr_threshold_which

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_attr_threshold_which(
        "Which album on the label Tiden Records has more than ten "
        "tracks?", g, cands)
    assert res["answer"] == "Linlin Garden"
    assert res["method"] == "attr_threshold_which"
    assert set(res["support_idxs"]) == {0, 1, 2}
    res = answer_attr_threshold_which(
        "Which album on the label Tiden Records has fewer than five "
        "tracks?", g, cands)
    assert res["answer"] == "Holden Harbor"
    # two members above the cut -> ambiguous
    assert answer_attr_threshold_which(
        "Which album on the label Tiden Records has more than five "
        "tracks?", g, cands) is None
    # a member without a count -> unsound
    assert answer_attr_threshold_which(
        "Which album on the label Tiden Records has more than ten "
        "tracks?", g, cands[:2]) is None


def test_inverse_hop_attr():
    """v18 kind 56: spouse forward, work AGAINST performed_by, then a
    word-number attribute read on the hopped-to work."""
    from anorag_tpu.answer.comparative import answer_inverse_hop_attr

    g = NoteGraph()
    text = "Mira Vel married Tane Bo."
    keys = extract_note_keys(text, ["Mira Vel", "Tane Bo"])
    g.add_notes([{"note_id": "s0", "content": text, **keys,
                  "paragraph_idxs": [1]}])
    text = "Gorba Horizon is an album by Tane Bo."
    keys = extract_note_keys(text, ["Gorba Horizon", "Tane Bo"])
    g.add_notes([{"note_id": "w0", "content": text, **keys,
                  "paragraph_idxs": [4]}])
    cands = [{"title": "Gorba Horizon (album)", "paragraph_idxs": [4],
              "content": "Gorba Horizon features eleven tracks."}]
    res = answer_inverse_hop_attr(
        "How many tracks does the album performed by the spouse of "
        "Mira Vel have?", g, cands)
    assert res["answer"] == "11" and res["method"] == "inverse_hop_attr"
    assert set(res["support_idxs"]) == {1, 4}
    # a second DISTINCT work by the spouse makes the hop ambiguous
    text = "Kesvel River is an album by Tane Bo."
    keys = extract_note_keys(text, ["Kesvel River", "Tane Bo"])
    g.add_notes([{"note_id": "w1", "content": text, **keys,
                  "paragraph_idxs": [6]}])
    assert answer_inverse_hop_attr(
        "How many tracks does the album performed by the spouse of "
        "Mira Vel have?", g, cands) is None


def test_dual_label_membership():
    """v18 kind 57: intersection of two reverse label sets — the second
    edge rides a reissue sentence; enumerating both sets is support."""
    from anorag_tpu.answer.comparative import answer_dual_label

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970)])
    g2_entries = [("Denon Harbor", 1966)]
    for i, (work, year) in enumerate(g2_entries):
        text = f"{work} was released in {year} on the label Velpri Sound."
        keys = extract_note_keys(text, [work, str(year), "Velpri Sound"])
        g.add_notes([{"note_id": f"v{i}", "content": text, **keys,
                      "paragraph_idxs": [5 + i]}])
    # the shared member: primary on Tiden, reissued on Velpri
    text = ("Holden Harbor was reissued in 1975 on the label "
            "Velpri Sound.")
    keys = extract_note_keys(text, ["Holden Harbor", "1975",
                                    "Velpri Sound"])
    g.add_notes([{"note_id": "r0", "content": text, **keys,
                  "paragraph_idxs": [0]}])
    res = answer_dual_label(
        "Which album was released both on the label Tiden Records and "
        "on the label Velpri Sound?", g, [])
    assert res["answer"] == "Holden Harbor" and res["method"] == "dual_label"
    assert set(res["support_idxs"]) == {0, 1, 5}
    # labels with an empty intersection fall through
    assert answer_dual_label(
        "Which album was released both on the label Tiden Records and "
        "on the label Nosuch Disc?", g, []) is None


def test_conjunctive_spouse_operand_hop():
    """v19 kind 58: the performer operand of the conjunction resolves
    through spouse_of first; the marriage note joins the proof."""
    from anorag_tpu.answer.comparative import answer_conjunctive

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970)])
    text = "Mira Vel married Tane Bo."
    keys = extract_note_keys(text, ["Mira Vel", "Tane Bo"])
    g.add_notes([{"note_id": "s0", "content": text, **keys,
                  "paragraph_idxs": [7]}])
    # the spouse performs TWO works; only one sits on the asked label
    for i, (work, on_label) in enumerate(
            [("Holden Harbor", True), ("Offlabel River", False)]):
        text = f"{work} is an album by Tane Bo."
        keys = extract_note_keys(text, [work, "Tane Bo"])
        g.add_notes([{"note_id": f"w{i}", "content": text, **keys,
                      "paragraph_idxs": [8 + i]}])
    res = answer_conjunctive(
        "Which album by the spouse of Mira Vel was released on the "
        "label Tiden Records?", g, [])
    assert res["answer"] == "Holden Harbor"
    assert res["method"] == "conjunctive"
    # marriage note + the winner's performer and label notes
    assert set(res["support_idxs"]) == {7, 8, 0}
    # an unresolvable spouse falls through
    assert answer_conjunctive(
        "Which album by the spouse of Nobody Here was released on the "
        "label Tiden Records?", g, []) is None


def test_superlative_attr_read_on_argmin():
    """v19 kind 59: attribute read on the ARGMIN of the release years;
    the proof cites every member's year fact + the count sentence."""
    from anorag_tpu.answer.comparative import answer_superlative_attr

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [{"title": "Holden Harbor (album)", "paragraph_idxs": [0],
              "content": "Holden Harbor features thirteen tracks."}]
    res = answer_superlative_attr(
        "How many tracks does the first album released on the label "
        "Tiden Records have?", g, cands)
    assert res["answer"] == "13" and res["method"] == "superlative_attr"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # the LAST album's count is unstated -> unsound, fall through
    assert answer_superlative_attr(
        "How many tracks does the latest album released on the label "
        "Tiden Records have?", g, cands) is None


def test_count_threshold_non_strict():
    """v19 kind 60: at-least/at-most flip the answer vs the strict
    reading when a member sits exactly ON the cut."""
    from anorag_tpu.answer.comparative import answer_count_threshold

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have at least "
        "seven tracks?", g, cands)
    assert res["answer"] == "2"          # strict 'more than seven' = 1
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have at most "
        "seven tracks?", g, cands)
    assert res["answer"] == "2"          # strict 'fewer than seven' = 1
    res = answer_count_threshold(
        "How many albums on the label Tiden Records have no more than "
        "three tracks?", g, cands)
    assert res["answer"] == "1"


def test_forall_attr_quantification():
    """v19 kind 61: universal quantification over a word-number
    attribute; one counterexample flips to 'no', a missing count is
    unsound."""
    from anorag_tpu.answer.comparative import answer_forall_attr

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features twelve tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_forall_attr(
        "Do all albums on the label Tiden Records have more than six "
        "tracks?", g, cands)
    assert res["answer"] == "yes" and res["method"] == "forall_attr"
    assert set(res["support_idxs"]) == {0, 1, 2}
    res = answer_forall_attr(
        "Do all albums on the label Tiden Records have more than ten "
        "tracks?", g, cands)
    assert res["answer"] == "no"
    # non-strict comparator vocabulary works here too
    res = answer_forall_attr(
        "Do all albums on the label Tiden Records have at least seven "
        "tracks?", g, cands)
    assert res["answer"] == "yes"
    # a member without a count -> unsound
    assert answer_forall_attr(
        "Do all albums on the label Tiden Records have more than six "
        "tracks?", g, cands[:2]) is None


def test_superlative_span_years_apart():
    """v20 kind 62: the difference between two superlative-resolved
    operands; an unresolved member year hides an extremum -> unsound."""
    from anorag_tpu.answer.comparative import answer_superlative_span

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    res = answer_superlative_span(
        "How many years apart were the first and last albums released "
        "on the label Tiden Records?", g, [])
    assert res["answer"] == "12" and res["method"] == "superlative_span"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # a member without a year -> fall through
    text = "Ghost Echo came out on the label Tiden Records."
    keys = extract_note_keys(text, ["Ghost Echo", "Tiden Records"])
    g.add_notes([{"note_id": "g0", "content": text, **keys,
                  "paragraph_idxs": [9]}])
    assert answer_superlative_span(
        "How many years apart were the first and last albums released "
        "on the label Tiden Records?", g, []) is None


def test_negated_decade_selects_complement():
    """v20 kind 63: 'was NOT released in the <dec>s' selects the one
    member OUTSIDE the decade; several outside stays ambiguous."""
    from anorag_tpu.answer.comparative import answer_decade

    g = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1995),
                      ("Denon Harbor", 1966)])
    res = answer_decade(
        "Which album on the label Tiden Records was not released in "
        "the 1990s?", g, [])
    assert res["answer"] == "Denon Harbor" and res["method"] == "decade"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # the positive reading still selects the member IN the decade
    res = answer_decade(
        "Which album on the label Tiden Records was released in "
        "the 1960s?", g, [])
    assert res["answer"] == "Denon Harbor"
    # two members outside the asked decade -> ambiguous
    assert answer_decade(
        "Which album on the label Tiden Records was not released in "
        "the 1960s?", g, []) is None


def test_superlative_spouse_three_step():
    """v20 kind 64: superlative -> performed_by -> spouse_of; the
    marriage note joins the proof."""
    from anorag_tpu.answer.comparative import answer_superlative_spouse

    g = _label_graph([("Holden Harbor", 1958), ("Linlin Garden", 1970),
                      ("Denon Harbor", 1966)])
    text = "Holden Harbor is an album performed by Mira Vel."
    keys = extract_note_keys(text, ["Holden Harbor", "Mira Vel"])
    g.add_notes([{"note_id": "p0", "content": text, **keys,
                  "paragraph_idxs": [0]}])
    text = "Mira Vel married Tane Bo."
    keys = extract_note_keys(text, ["Mira Vel", "Tane Bo"])
    g.add_notes([{"note_id": "s0", "content": text, **keys,
                  "paragraph_idxs": [5]}])
    res = answer_superlative_spouse(
        "Who is the spouse of the performer of the first album "
        "released on the label Tiden Records?", g, [])
    assert res["answer"] == "Tane Bo"
    assert res["method"] == "superlative_spouse"
    assert set(res["support_idxs"]) == {0, 1, 2, 5}
    # no marriage fact for the resolved performer -> fall through
    assert answer_superlative_spouse(
        "Who is the spouse of the performer of the last album "
        "released on the label Tiden Records?", g, []) is None


def test_attr_sum_decade_filtered():
    """v20 kind 65: the total runs over the members in the asked
    decade; the excluded member's year fact is still support, and a
    missing count on an INCLUDED member is unsound."""
    from anorag_tpu.answer.comparative import answer_attr_sum

    g = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1995),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
    ]
    res = answer_attr_sum(
        "How many tracks in total do the albums released on the label "
        "Tiden Records in the 1990s have?", g, cands)
    assert res["answer"] == "22" and res["method"] == "attr_sum"
    assert set(res["support_idxs"]) == {0, 1, 2}
    # unfiltered phrasing still sums the whole set (and now needs the
    # third count)
    cands.append(
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."})
    res = answer_attr_sum(
        "How many tracks do the albums released on the label "
        "Tiden Records have in total?", g, cands)
    assert res["answer"] == "29"
    # an INCLUDED member without a count -> unsound
    assert answer_attr_sum(
        "How many tracks in total do the albums released on the label "
        "Tiden Records in the 1990s have?", g, cands[:1]) is None


# -------------------------------------------------------- v29 stages
def test_attr_median_order_statistic():
    """v29 kind 98: median is a SORT, not a sum — and an even-sized set
    averages the middle pair."""
    from anorag_tpu.answer.comparative import answer_attr_average

    g = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1995),
                      ("Denon Harbor", 1966)])
    cands = [
        {"title": "Holden Harbor (album)", "paragraph_idxs": [0],
         "content": "Holden Harbor features three tracks."},
        {"title": "Linlin Garden (album)", "paragraph_idxs": [1],
         "content": "Linlin Garden features nineteen tracks."},
        {"title": "Denon Harbor (album)", "paragraph_idxs": [2],
         "content": "Denon Harbor features seven tracks."},
    ]
    res = answer_attr_average(
        "What is the median number of tracks across the albums on the "
        "label Tiden Records?", g, cands)
    assert res["answer"] == "7" and res["method"] == "attr_median"
    # the mean phrasing still takes the mean path on the same set
    res = answer_attr_average(
        "What is the average number of tracks across the albums on the "
        "label Tiden Records?", g, cands)
    assert res["method"] == "attr_average"


def test_between_which_unique_interior_member():
    """v29 kind 99: strict two-anchor interval selection; ambiguous or
    empty interiors are unsound."""
    from anorag_tpu.answer.comparative import answer_between_which

    g = _label_graph([("Holden Harbor", 1960), ("Linlin Garden", 1975),
                      ("Denon Harbor", 1990), ("Tora Echo", 2001)])
    res = answer_between_which(
        "Which album on the label Tiden Records was released after "
        "Holden Harbor but before Denon Harbor?", g, [])
    assert res["answer"] == "Linlin Garden"
    assert res["method"] == "between_which"
    # two interior members -> ambiguous -> None
    assert answer_between_which(
        "Which album on the label Tiden Records was released after "
        "Holden Harbor but before Tora Echo?", g, []) is None


def test_label_descriptor_spouse_founder_count():
    """v29 kind 100: 'the label founded by the spouse of P' resolves
    through spouse_of then AGAINST founded_by before the count."""
    from anorag_tpu.answer.comparative import answer_count
    from anorag_tpu.llm.note_generator import extract_note_keys

    g = _label_graph([("Holden Harbor", 1992), ("Linlin Garden", 1995)])
    for nid, text, ents in (
            ("sp", "Mira Tolin married Benda Kesh.",
             ["Mira Tolin", "Benda Kesh"]),
            ("fd", "Tiden Records was founded by Benda Kesh.",
             ["Tiden Records", "Benda Kesh"])):
        keys = extract_note_keys(text, ents)
        g.add_notes([{"note_id": nid, "content": text, **keys,
                      "paragraph_idxs": [9]}])
    res = answer_count(
        "How many albums were released on the label founded by the "
        "spouse of Mira Tolin?", g, [])
    assert res["answer"] == "2"
    assert 9 in res["support_idxs"]


def test_performer_intersection_count():
    """v29 kind 101: COUNT of the roster intersection (the selection
    stage refuses when the intersection isn't a single performer)."""
    from anorag_tpu.answer.comparative import (
        answer_performer_intersection_count)
    from anorag_tpu.llm.note_generator import extract_note_keys

    g = NoteGraph()
    rows = [
        ("a0", "Holden Harbor was released in 1990 on the label Kone Disc.",
         ["Holden Harbor", "1990", "Kone Disc"]),
        ("a1", "Holden Harbor is an album by Mira Tolin.",
         ["Holden Harbor", "Mira Tolin"]),
        ("b0", "Linlin Garden was released in 1991 on the label Vane Disc.",
         ["Linlin Garden", "1991", "Vane Disc"]),
        ("b1", "Linlin Garden is an album by Mira Tolin.",
         ["Linlin Garden", "Mira Tolin"]),
        ("c0", "Denon Harbor was released in 1992 on the label Vane Disc.",
         ["Denon Harbor", "1992", "Vane Disc"]),
        ("c1", "Denon Harbor is an album by Sato Benlin.",
         ["Denon Harbor", "Sato Benlin"]),
    ]
    for nid, text, ents in rows:
        keys = extract_note_keys(text, ents)
        g.add_notes([{"note_id": nid, "content": text, **keys,
                      "paragraph_idxs": [int(nid[1])]}])
    res = answer_performer_intersection_count(
        "How many performers released albums on both the label Kone Disc "
        "and the label Vane Disc?", g, [])
    assert res["answer"] == "1"
