"""End-to-end answer-quality regression floor.

Runs the full per-item pipeline (chunk -> rule notes -> embed -> graph ->
hybrid retrieve -> EFSA answer) LLM-free over a synthetic multi-hop set and
asserts minimum EM. Guards the pipeline's answer quality against regressions
the unit tests can't see (this caught four real bugs during the round-1
verification pass).
"""
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.eval.musique import evaluate_dataset
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.pipeline_musique import process_musique_item

PEOPLE = [
    ("Aurora Lane", "Blue Horizon", "Chris Reed", "Boston"),
    ("Marcus Webb", "Silent River", "Dana Fox", "Chicago"),
    ("Elena Cortez", "Quantum Steps", "Sam Hale", "Denver"),
    ("David Kim", "Nexus Origins", "Lee Chang", "Austin"),
]


def _items():
    items = []
    for i, (person, work, spouse, city) in enumerate(PEOPLE):
        items.append({
            "id": f"hop2_{i}",
            "question": f"Who is the spouse of the performer of {work}?",
            "answer": spouse,
            "paragraphs": [
                {"idx": 0, "title": work,
                 "paragraph_text": f"{work} is an album performed by {person}.",
                 "is_supporting": True},
                {"idx": 1, "title": person,
                 "paragraph_text": f"{person} married {spouse}. The spouse of {person} is {spouse}.",
                 "is_supporting": True},
                {"idx": 2, "title": "Distractor",
                 "paragraph_text": f"The weather in {city} is mild in spring. Parks are crowded."},
            ],
        })
        items.append({
            "id": f"hop1_{i}",
            "question": f"Where was {person} born?",
            "answer": city,
            "paragraphs": [
                {"idx": 0, "title": person,
                 "paragraph_text": f"{person} was born in {city}.", "is_supporting": True},
                {"idx": 1, "title": "Distractor",
                 "paragraph_text": f"{work} received favorable reviews from critics."},
            ],
        })
    return items


@pytest.mark.slow
def test_llm_free_pipeline_quality(tmp_path):
    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")
    cfg.set("clustering.n_clusters", 2)
    em = EmbeddingManager(cfg=cfg, singleton=False)

    items = _items()
    preds = [
        process_musique_item(it, tmp_path / str(it["id"]), cfg=cfg, embedding_manager=em)
        for it in items
    ]
    metrics = evaluate_dataset(preds, items)
    assert metrics["n_evaluated"] == len(items)
    # LLM-free floor: the relation-chain selector + EFSA must nail the
    # synthetic set (exact surface forms present in the notes)
    # the round-2 answer-path work (merged rule notes, 1-hop rel chains,
    # trailing-verb chain ordering, wh-type gating) took the synthetic-200
    # driver eval from 0.44 to 1.00 EM; this floor guards the small set
    assert metrics["answer_em"] >= 0.9, metrics
    assert metrics["support_f1"] >= 0.6, metrics


@pytest.mark.slow
def test_generated_musique_all_kinds(tmp_path):
    """The 14-kind synthetic generator (scripts/gen_synth_musique.py)
    through the full per-item pipeline. The v1 kinds (1/2/3-hop over the
    cue lexicon) must stay SOLVED (they took the 200-item driver eval from
    0.44 to 1.00 EM); the v2 kinds (4-hop label chain, outside-lexicon
    relations, unanswerable) were closed by the round-3 answer-path work
    (EM 0.709 -> 0.994) and the v3 kinds (comparative release-order,
    'artist behind' paraphrase) by the comparative exact-math stage + the
    agentive cue family (EM 0.772 -> 1.00). The v4 kinds (10-13: temporal
    difference, label-set superlative, yes/no, count) were closed by the
    exact-math dispatcher + secondary note triples (EM 0.710 -> 1.00),
    and the v5 evidence-side paraphrase banks by lexicon coverage,
    per-sentence multi-triple extraction, the sentence-bounded entity
    regex, and topic-aware neuter-pronoun coref (EM 0.30 -> 1.00,
    supF1 0.979 on the 200-item driver eval). The v6 realistic-text
    surfaces (filler sentences, surname-only coref, appositive
    multi-relation sentences, day-month dates; floor EM 0.634) were
    closed by appositive clause expansion, surname->full-name coref,
    month-token entity exclusion + label-tail year guard, and the
    came-out-on/through-the-label cues (EM 1.00 / supF1 0.987) — the
    sweep also surfaced and fixed a _cluster_suppress KeyError (kept
    cluster members acting as owners). The v7 adversarial surfaces
    (negation foils naming a live confusable label chain, parenthetical
    label abbreviations carrying the founding facts, relative-offset
    release dates) recorded floor EM 0.946 / supF1 0.963 — every EM miss
    was an abbreviation-broken founder chain answering the label; closed
    by the negation guard, the corpus-level abbreviation alias pass, and
    released_offset triples resolved through the anchor's absolute year
    (EM 1.00 / supF1 0.985). The v8 kinds (14 label intersection, 15
    ordinal, 16 stage-name alias, 17 re-release trap) recorded floor
    EM 0.794 / supF1 0.906 and were closed by the ordinal +
    label-intersection exact-math stages, the stage-name alias pattern,
    and the adverb-tolerant released_on_label cue (EM 1.00 /
    supF1 0.985). The v9 kinds (18 conjunctive constraint, 19 decade
    membership, 20 bridged comparative option, 21 cross-chain same-city)
    recorded floor EM 0.859 / supF1 0.918 and were closed by four more
    exact-math stages + the word-boundary entity-position fix in
    extract_note_keys (a phantom 'BA'-inside-'Balu' match was corrupting
    head/tail assignment) — EM 1.00 / supF1 0.971. The v10 kinds (22
    performer-set superlative, 23 filtered count, 24 nested anchor, 25
    negated conjunctive) recorded floor EM 0.859 / supF1 0.943 and were
    closed by widening set anchors to performers, a decade-filtered
    count, nested superlative-option resolution in temporal diff, and
    set difference in the conjunctive stage — EM 1.00 / supF1 0.977
    (0.995 after canonical hop-note support). The v11 kinds (26
    inverse-hop anchor, 27 unordered temporal distance, 28 count
    comparative, 29 computed-distance superlative) recorded floor
    EM 0.876 / supF1 0.945 and were closed by the inverse-hop beam
    fallback (+ tail-key anchors, direction-aware support
    canonicalization) and three more exact-math stages — the 200-item
    driver eval's first perfect sheet: EM / supEM / supF1 all 1.00.
    The v12 kinds (30 time-scoped spouse, 31 track-count comparison, 32
    state coercion, 33 entity-present unanswerable) recorded floor
    EM 0.931 / ansAcc 0.975 and were closed by the spouse-at-time
    temporal join, the word-number attribute comparator, the
    which-state coercion hop, and the relation-coverage gate — EM 1.00 /
    ansAcc 1.00 / supF1 0.995. The v13 kinds (34 descriptive-person
    temporal join, 35 same-state equality with shared-state city pairs,
    36 immediate-successor release, 37 conjunctive count) recorded floor
    EM 0.899 / supF1 0.961 / ansAcc 1.00 — every miss in the four new
    kinds."""
    import sys
    from pathlib import Path as _P

    sys.path.insert(0, str(_P(__file__).resolve().parents[1] / "scripts"))
    from gen_synth_musique import make_items

    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")
    items = make_items(204, distractors=4, seed=9)  # 2 of each of 102 kinds
    preds = []
    for it in items:
        res = process_musique_item(it, tmp_path / it["id"], cfg=cfg, llm=None)
        preds.append(res)
    metrics = evaluate_dataset(preds, items)
    # v17 closed (kinds 50-53) at EM/supEM/supF1/ansAcc all 1.00 over
    # 216 items; v18 (kinds 54-57: hop-resolved comparative, threshold
    # WHICH, chain-end attribute read, dual-label membership) recorded
    # floor EM 0.4375 on the four new kinds, closed same session at all
    # 1.00 over 232 items (attr_threshold_which + inverse_hop_attr +
    # dual_label stages; kind 54 fell to the existing machinery).
    # v19 (kinds 58-61: hop-resolved conjunctive, superlative member +
    # attr read, non-strict at-least/at-most thresholds, forall over an
    # attribute) recorded floor EM 0.0 on the four new kinds — overall
    # floor 58/62 ~ 0.935; closed by the conjunctive spouse-operand hop,
    # the superlative_attr + forall_attr stages, and the shared
    # strict/non-strict threshold comparator (EM 1.00 on all four).
    assert metrics["answer_em"] >= 0.90, metrics
    assert metrics["support_f1"] >= 0.90, metrics
    # v20 (kinds 62-65: superlative span, negated decade selection,
    # spouse-of-performer-of-superlative, decade-filtered attribute sum)
    # recorded floor EM 0.375 on the four new kinds (62: 0.0, 63: 0.5,
    # 64: 1.0 by luck with partial support, 65: 0.0); closed by the
    # superlative_span + superlative_spouse stages, decade negation in
    # answer_decade, and the decade filter + flexible 'in total'
    # placement in attr_sum (EM 1.00 on all four).
    # v21 (kinds 66-69: cross-label superlative attr comparison, count
    # over a hop-resolved set anchor, temporal read on the attribute
    # argmax, existential over attribute + decade) recorded floor
    # EM 0.0 on the four new kinds; closed by the
    # label_attr_comparative, count_hop, attr_argmax_year, and
    # exists_attr_decade stages (EM 1.00, supF1 1.00 on all four).
    # v22 (kinds 70-73: superlative hop on an unnamed label,
    # decade-bucket count comparison, cross-label total attribute
    # comparison, attribute-equality count join) recorded floor EM 0.0
    # on the four new kinds; closed by the superlative_hop_unnamed,
    # decade_count_compare, label_attr_sum_compare, and
    # attr_equal_count stages (EM 1.00, supF1 1.00 on all four).
    # v23 (kinds 74-77: member selection through a 2-hop
    # performer-birth-city join, difference of superlative-resolved
    # attribute reads, negated decade count, decade-filtered attribute
    # superlative with a global-max trap) recorded floor EM 0.0 on the
    # four new kinds (200-item CLI floor with v23 open: EM 0.964);
    # closed by the member_born_join, superl_attr_difference,
    # count_not_decade, and decade_attr_superlative stages (EM 1.00,
    # supF1 1.00 on all four).
    # v24 (kinds 78-81: attribute ordinal, decade mode, yes/no
    # attribute comparison of two superlative operands, combined count
    # across two labels) recorded floor EM 0.0 on the four new kinds;
    # closed by the attr_ordinal, decade_mode, superl_attr_yesno, and
    # count_union stages (EM 1.00, supF1 1.00 on all four).
    # v25 (kinds 82-85: attribute average, decade enumeration, negative
    # release existence, hop-resolved threshold count) closed by the
    # attr_average, decade_enum, release_existence, and
    # count_after_anchor stages (EM 1.00, supF1 1.00 on all four).
    # v26 (kinds 86-89: reverse ordinal, performer intersection across
    # labels, anchor-relative window count, option-resolved 2-hop
    # selection) recorded floor EM 9/16 ~ 0.56 on the four new kinds;
    # closed by the descending rank already in answer_ordinal plus the
    # performer_intersection, count_within_anchor, and
    # option_spouse_born stages (EM 20/20, supF1 1.00).
    # v27 (kinds 90-93: two-anchor interval count, 4-step chain on the
    # resolved extremum, distinct count over a hop-resolved attribute,
    # same-year selection) recorded floor EM 0.967 / supF1 0.978 on the
    # 188-item CLI sheet (kind 91's floor seed passed by luck; 2/6 on
    # fresh seeds); closed by the count_between_anchors,
    # superlative_spouse_city, distinct_birth_cities, and
    # same_year_member stages + 'most recent' joining _ORD_MAX
    # (EM/supEM/supF1/ansAcc all 1.00 on the 188-item CLI sheet).
    # any individual miss outside `tolerated_kinds` is a regression.
    # When a vN adds unsolved kinds, list them here until closed.
    tolerated_kinds: set = set()
    from anorag_tpu.eval.musique import answer_em, gold_aliases
    by_id = {it["id"]: it for it in items}
    for p in preds:
        it = by_id[p["id"]]
        if not it.get("answerable", True):
            continue
        i = int(p["id"].split("_")[1])
        if i % 102 in tolerated_kinds:
            continue
        assert answer_em(p.get("predicted_answer") or "",
                         gold_aliases(it)) == 1.0, \
            (p["id"], i % 102, it["question"], it["answer"],
             p.get("predicted_answer"))
