"""Context layer + answer layer + validators."""
import numpy as np
import pytest

from anorag_tpu.answer.answer_selector import answer_question, extract_rel_chain
from anorag_tpu.answer.efsa import (
    compute_cov_cons, efsa_answer, efsa_answer_with_fallback,
    extract_bridge_info_from_candidates,
)
from anorag_tpu.answer.evidence_rerank import EvidenceReranker
from anorag_tpu.answer.path_validator import PathValidator
from anorag_tpu.answer.span_picker import SpanPicker, candidate_spans
from anorag_tpu.answer.support_fill import fill_support_idxs_noid
from anorag_tpu.answer.verifier import AnswerVerifier
from anorag_tpu.context.dispatcher import ContextDispatcher
from anorag_tpu.context.packer import ContextPacker
from anorag_tpu.context.scheduler import ContextScheduler, MultiHopContextScheduler
from anorag_tpu.context.structure_pack import StructurePacker
from anorag_tpu.graph.note_graph import NoteGraph
from anorag_tpu.reasoning.qa_coverage import QACoverageScorer, question_type
from anorag_tpu.support.k_estimator import KEstimator
from anorag_tpu.validators import validate_final_answer, validate_note
from anorag_tpu.validators.note_validator import normalize_note

from conftest import make_notes


# ----------------------------------------------------------------- dispatcher
def _cands():
    out = []
    for i in range(12):
        out.append({
            "note_id": f"c{i}",
            "final_score": 1.0 - i * 0.05,
            "tags": {"source": "graph" if i % 3 == 0 else "semantic",
                     "is_bridge": i == 11},
            "content": f"text {i}",
        })
    return out


def test_dispatcher_legacy_quota_and_keepalive():
    d = ContextDispatcher(final_semantic_count=3, final_graph_count=2,
                          bridge_policy="keepalive")
    out = d.dispatch(_cands())
    srcs = [c["tags"]["source"] for c in out]
    assert srcs.count("semantic") <= 3 + 1  # +1 possible bridge
    # bridge note (lowest score) must survive via keepalive
    assert any(c["note_id"] == "c11" for c in out)


def test_dispatcher_bridge_boost():
    d = ContextDispatcher(bridge_policy="boost", bridge_boost_epsilon=5.0)
    out = d.dispatch(_cands())
    assert out[0]["note_id"] == "c11"  # giant epsilon pushes bridge first


def test_scheduler_coverage_guard():
    cands = [
        {"note_id": "a", "final_score": 0.9, "content": "alpha beta gamma"},
        {"note_id": "b", "final_score": 0.8, "content": "delta epsilon"},
        {"note_id": "c", "final_score": 0.1, "content": "zeta history question"},
    ]
    s = ContextScheduler(max_notes=2)
    out = s.schedule(cands, sub_questions=["zeta history"])
    assert any(c["note_id"] == "c" for c in out)


def test_multihop_scheduler_hop_decay():
    cands = [
        {"note_id": "h1", "final_score": 0.5, "hop_no": 1, "content": "x"},
        {"note_id": "h2", "final_score": 0.5, "hop_no": 3, "content": "y"},
    ]
    s = MultiHopContextScheduler(max_notes=2)
    out = s.schedule_for_multi_hop(cands)
    assert out[0]["note_id"] == "h1"  # same base, hop 1 decays less


def test_packer_tags_and_support(notes):
    p = ContextPacker()
    ctx, support = p.pack_context(notes[:4], query="q")
    assert ctx.count("[P") == 4
    assert support == [n["paragraph_idxs"][0] for n in notes[:4]]


def test_packer_budget():
    p = ContextPacker(max_tokens=10)
    long_notes = [{"paragraph_idxs": [i], "title": "T", "content": "word " * 50}
                  for i in range(5)]
    ctx, support = p.pack_context(long_notes)
    assert len(support) <= 1


def test_k_estimator_complexity():
    ke = KEstimator()
    assert ke.estimate_K("Who is X?") == 2
    deep = ke.estimate_K("Who is the spouse of the performer of the song of the year?")
    assert deep >= 3
    assert ke.estimate_K("q", graph_distance=4) == 4


def test_structure_packer_answer_first():
    notes = [
        {"paragraph_idxs": [0], "title": "Noise", "content": "Unrelated filler text entirely."},
        {"paragraph_idxs": [1], "title": "Key", "content": "Aurora Lane is the singer of Blue Horizon."},
    ]
    sp = StructurePacker(token_budget=200)
    ctx, support = sp.pack_evidence(notes, "Who is the singer of Blue Horizon?")
    assert ctx.startswith("[P1]")
    assert support[0] == 1


# ------------------------------------------------------------------ QA / EFSA
def test_question_type():
    assert question_type("Who sang it?") == "person"
    assert question_type("When was it released?") == "time"


def test_qa_coverage_ranks_answerable_sentence():
    qa = QACoverageScorer()
    s, sc = qa.best_sentence(
        "Who directed Silent River?",
        "The weather was nice. Marcus Webb directed Silent River in 2001.",
    )
    assert "Marcus Webb" in s and sc > 0.2


def test_qa_coverage_training_improves():
    qa = QACoverageScorer()
    pairs = [
        ("Who is A?", "A is a famous Person Name.", 1.0),
        ("Who is A?", "the cat sat on the mat", 0.0),
        ("When did B happen?", "B happened in 1999.", 1.0),
        ("When did B happen?", "B is nice generally speaking", 0.0),
    ] * 10
    acc = qa.train(pairs)
    assert acc >= 0.9


def test_efsa_cov_cons():
    note = {"entities": ["Aurora Lane", "Boston"], "title": "t",
            "content": "Aurora Lane lives in boston"}
    cov, cons = compute_cov_cons(note, ["boston", "paris"])
    assert cov == 0.5 and cons == 1


def test_efsa_exact_math():
    cands = [
        {"note_id": "n1", "doc_id": "d1", "entities": ["Answer Entity"],
         "final_score": 1.0, "hop_no": 1, "title": "", "content": ""},
        {"note_id": "n2", "doc_id": "d2", "entities": ["Answer Entity"],
         "final_score": 0.5, "hop_no": 2, "title": "", "content": "",
         "paragraph_idxs": [7]},
        {"note_id": "n3", "doc_id": "d1", "entities": ["Other"],
         "final_score": 0.8, "hop_no": 1, "title": "", "content": ""},
    ]
    ans, support, score = efsa_answer(cands, "q")
    assert ans == "Answer Entity"
    # w1 = 1.0, w2 = 0.5*0.85 = 0.425; diversity = 1 + 0.03*1
    assert score == pytest.approx((1.0 + 0.425) * 1.03)
    assert support[0] == "n1"  # no paragraph_idxs -> note_id fallback
    assert support[1] == 7


def test_efsa_excludes_bridge():
    cands = [
        {"note_id": "n1", "doc_id": "d", "entities": ["Bridge"], "final_score": 1.0},
        {"note_id": "n2", "doc_id": "d", "entities": ["Real"], "final_score": 0.2},
    ]
    ans, _, _ = efsa_answer(cands, "q", bridge_entity="bridge")
    assert ans == "Real"


def test_efsa_fallback():
    ans, support, score = efsa_answer_with_fallback(
        [{"note_id": "n", "doc_id": "d", "entities": [], "final_score": 1.0,
          "content": "Some long content here", "paragraph_idxs": [3]}],
        "q",
    )
    assert ans.startswith("Some long content")
    assert support == [3] and score == 0.0


def test_bridge_info_extraction():
    b, pe = extract_bridge_info_from_candidates([
        {"bridge_entity": "X", "bridge_path": ["a", "b"]},
        {"bridge_path": ["b", "c"]},
    ])
    assert b == "X" and pe == ["a", "b", "c"]


# ------------------------------------------------------------ answer selector
def _kb():
    ng = NoteGraph()
    ng.add_notes([
        {"note_id": "n1", "text": "Blue Horizon is performed by Aurora Lane",
         "head_key": "Blue Horizon", "rel": "performed_by", "tail_key": "Aurora Lane"},
        {"note_id": "n2", "text": "Aurora Lane's spouse is Chris Reed",
         "head_key": "Aurora Lane", "rel": "spouse_of", "tail_key": "Chris Reed"},
    ])
    return ng


def test_rel_chain_extraction_order():
    chain = extract_rel_chain("Who is the spouse of the performer of Blue Horizon?")
    assert chain is not None
    assert chain[0] == "performed_by"
    assert "spouse_of" in chain[1]


def test_answer_selector_full_chain():
    res = answer_question("Who is the spouse of the performer of Blue Horizon?", _kb())
    assert res is not None
    assert res["answer"] == "Chris Reed"
    assert res["support_note_ids"] == ["n1", "n2"]


def test_answer_selector_no_chain_returns_none():
    assert answer_question("What color is the sky?", _kb()) is None


# ------------------------------------------------------------------ span/verify
def test_candidate_spans_types():
    spans = dict(candidate_spans('The song "Blue Horizon" came out on March 5, 1999.'))
    assert spans.get("Blue Horizon") == "quoted"
    assert any(t == "time" for t in spans.values())


def test_span_picker_person_question():
    sp = SpanPicker()
    best = sp.pick_best_span(
        "Who directed Silent River?",
        "Silent River premiered in 2001. Marcus Webb directed Silent River.",
    )
    assert "Marcus Webb" in best["span"]


def test_verifier_accepts_supported_answer():
    v = AnswerVerifier()
    out = v.finalize_answer("Who directed Silent River?", "Marcus Webb",
                            "Marcus Webb directed Silent River.")
    assert out["verified"] and out["answer"] == "Marcus Webb"


def test_verifier_corrects_unsupported_answer():
    v = AnswerVerifier(accept_threshold=0.9)
    out = v.finalize_answer("Who directed Silent River?", "Totally Wrong",
                            "Marcus Webb directed Silent River.")
    assert out["answer"] != "Totally Wrong" or not out["verified"]


def test_evidence_rerank_album_bonus():
    er = EvidenceReranker()
    notes = [
        {"note_id": "s", "title": "Thing (song)", "final_score": 0.5},
        {"note_id": "a", "title": "Thing (album)", "final_score": 0.5},
    ]
    out = er.rerank(notes, query="which album did the performer release")
    assert out[0]["note_id"] == "a"
    assert out[0]["evidence_rerank_bonus"] > 0


def test_path_validator_repairs_bundle():
    pv = PathValidator(rel_chains=[["performed_by", "spouse_of"]], allow_partial=False)
    bundle = [{"note_id": "x", "content": "irrelevant text"}]
    candidates = [
        {"note_id": "p", "content": "The song was performed by Aurora."},
        {"note_id": "s", "content": "She married Chris; her spouse is kind."},
    ]
    fixed = pv.ensure_valid_bundle(bundle, candidates,
                                   "Who is the spouse of the performer of Blue Horizon?")
    ids = {n["note_id"] for n in fixed}
    assert "p" in ids and "s" in ids


def test_support_fill_answer_paragraphs(notes):
    cands = [dict(n) for n in notes[:6]]
    out = fill_support_idxs_noid("Aurora Lane", cands, query="Who sings Blue Horizon?")
    assert out
    assert all(isinstance(i, int) for i in out)


# --------------------------------------------------------------- validators
def test_validate_final_answer_verbatim():
    ctx = "Aurora Lane is the singer of Blue Horizon."
    ok, issues, norm = validate_final_answer(
        {"answer": "Aurora Lane", "evidence_spans": ["Aurora Lane is the singer"]}, ctx)
    assert ok and norm["answer"] == "Aurora Lane"
    ok2, issues2, norm2 = validate_final_answer(
        {"answer": "Aurora Lane", "evidence_spans": ["fabricated span"]}, ctx)
    assert not ok2 and norm2["insufficient"]


def test_validate_note_and_normalize():
    raw = {"text": "some content", "method": "vector", "hop_type": "second_hop",
           "path": ["A", "B"]}
    n = normalize_note(raw)
    ok, issues = validate_note(n)
    assert ok, issues
    assert n["retrieval_method"] == "dense"
    assert n["hop_no"] == 2
    assert n["bridge_entity"] == "B"


def test_efsa_excludes_question_subset_entities():
    # "Horizon 7" is fully contained in the question's tokens -> cannot be
    # the answer even though exact-match exclusion misses it (query entity
    # extraction may yield only "Horizon")
    cands = [{
        "note_id": "n1", "doc_id": "d1", "final_score": 1.0, "hop_no": 1,
        "title": "Horizon 7", "content": "Horizon 7 was created by Ivan Frost.",
        "entities": ["Horizon 7", "Ivan Frost"], "paragraph_idxs": [0],
    }]
    ans, support, _ = efsa_answer(cands, "Who created Horizon 7?",
                                  exclude_entities=["Horizon"])
    assert ans == "Ivan Frost"
    assert support == [0]


def test_rel_chain_single_hop_and_trailing_verb():
    """Chain extraction: 1-hop questions produce a one-relation chain (the
    beam answers them; EFSA's bridge exclusion must not), and a trailing
    verb after the last entity is the OUTERMOST relation."""
    from anorag_tpu.answer.answer_selector import (
        extract_rel_chain, relation_cue_count)

    assert extract_rel_chain("Who performed Marne Signal?") == ["performed_by"]
    assert relation_cue_count("Who performed Marne Signal?") == 1
    assert extract_rel_chain("Where was the performer of Tiba Harbor born?") \
        == ["performed_by", "born_in"]
    assert relation_cue_count("Where was the performer of X born?") == 2
    assert extract_rel_chain("Who is the spouse of the performer of Blue Horizon?") \
        == ["performed_by", "spouse_of|partner_of"]


def test_rel_chain_no_entity_falls_back_innermost_first():
    """Lowercase/unrecognized entity surfaces locate no entity boundary
    (ent_end == 0); the chain must still resolve innermost-first, not
    reverse into question order."""
    from anorag_tpu.answer.answer_selector import extract_rel_chain

    chain = extract_rel_chain("who is the spouse of the performer of blue horizon?")
    assert chain == ["performed_by", "spouse_of|partner_of"]


def test_nested_hop_shape_outside_cue_lexicon():
    """'of the X of Y' nesting marks a multi-hop question even when its
    relations (director-of, capital-of, ...) are outside _CUE_RELS, so the
    bridge-exclusion gate keeps the intermediate entity excluded."""
    from anorag_tpu.answer.answer_selector import has_nested_hop_shape

    assert has_nested_hop_shape(
        "What is the capital of the country of origin of Blue Horizon?")
    assert has_nested_hop_shape(
        "Who directed the film produced by the founder of Acme?")
    assert not has_nested_hop_shape("Who performed Marne Signal?")
    assert not has_nested_hop_shape("What is the capital of France?")


def test_efsa_type_gate_and_subject_cooc():
    """'Where' answers can't be persons or years; question-subject
    co-occurrence weights the linked note's entities up."""
    from anorag_tpu.answer.efsa import efsa_answer

    pool = [
        {"note_id": "a", "doc_id": "d1", "title": "Work X",
         "content": "Work X is an album performed by Ann Lee. It was released in 1983.",
         "entities": ["Work X", "Ann Lee", "1983"], "final_score": 0.9,
         "paragraph_idxs": [0]},
        {"note_id": "b", "doc_id": "d2", "title": "Ann Lee",
         "content": "Ann Lee was born in Denver.",
         "entities": ["Ann Lee", "Denver"], "final_score": 0.3,
         "paragraph_idxs": [1]},
        {"note_id": "c", "doc_id": "d3", "title": "Bob Ray",
         "content": "Bob Ray was born in Seattle.",
         "entities": ["Bob Ray", "Seattle"], "final_score": 0.5,
         "paragraph_idxs": [2]},
    ]
    ans, _, _ = efsa_answer(pool, "Where was the performer of Work X born?",
                            bridge_entity="Ann Lee",
                            exclude_entities=["Work X"])
    assert ans == "Denver"   # not 1983 (year), not a person, not Seattle
    # without the subject/bridge link, the higher-scored city wins instead
    ans2, _, _ = efsa_answer(pool, "Where was the performer of Work X born?",
                             subject_cooc_boost=0.0,
                             exclude_entities=["Work X"])
    assert ans2 in ("Denver", "Seattle")


def test_span_picker_ignores_pack_markers():
    from anorag_tpu.answer.span_picker import candidate_spans

    spans = [s for s, _ in candidate_spans(
        "[P8] synth_1: Ann Lee was born in Denver.")]
    assert "Denver" in " ".join(spans)
    assert not any(s in ("P8", "[P8]", "synth_1") for s in spans)


def test_label_chain_extraction_and_keys():
    """Round-3 label-chain machinery: the 'label that released X' questions
    parse into released_on_label chains (the generic 'released'->year cue
    is shadowed), and note-key extraction handles the priority label
    relation, pronoun-coref'd subjects, and active-voice inversion."""
    from anorag_tpu.answer.answer_selector import (extract_rel_chain,
                                                   relation_cue_count)
    from anorag_tpu.llm.note_generator import extract_note_keys

    q6 = "Who is the spouse of the founder of the label that released Togor Echo?"
    assert extract_rel_chain(q6) == [
        "released_on_label", "founded_by", "spouse_of|partner_of"]
    q5 = ("Where was the spouse of the founder of the label that released "
          "Togor Echo born?")
    assert extract_rel_chain(q5) == [
        "released_on_label", "founded_by", "spouse_of|partner_of", "born_in"]
    assert relation_cue_count(q6) == 3
    # shadowing must NOT remove released_in from plain year questions
    assert extract_rel_chain("When was Togor Echo released?") == ["released_in"]

    # priority label relation keys the subject, not the nearer year entity
    assert extract_note_keys(
        "Togor Echo was released in 2006 on the label Fenza Disc.",
        ["Togor Echo", "2006", "Fenza Disc"]) == {
        "head_key": "Togor Echo", "rel": "released_on_label",
        "tail_key": "Fenza Disc",
        # the sentence asserts the year fact too: secondary edge for the
        # aggregation answer stages
        "secondary_keys": [{"head_key": "Togor Echo", "rel": "released_in",
                            "tail_key": "2006"}]}
    # active voice inverts; passive keeps subject-side head
    active = extract_note_keys("Tigor Toshavel founded Fenza Disc.",
                               ["Tigor Toshavel", "Fenza Disc"])
    passive = extract_note_keys("Fenza Disc was founded by Tigor Toshavel.",
                                ["Fenza Disc", "Tigor Toshavel"])
    assert active == passive == {
        "head_key": "Fenza Disc", "rel": "founded_by",
        "tail_key": "Tigor Toshavel"}
