"""Invariants of the synthetic MuSiQue generator (scripts/
gen_synth_musique.py). The driver's answer-quality floors are measured
against this generator — a silent gold-corruption bug here would
invalidate every recorded floor, so the invariants are tested across
seeds.
"""
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from gen_synth_musique import make_items  # noqa: E402

N_KINDS = 102


def _mk(seed, n=N_KINDS * 2):
    return make_items(n, distractors=4, seed=seed)


def test_item_shape_and_support_invariants():
    for seed in (0, 3, 11):
        items = _mk(seed)
        for i, it in enumerate(items):
            kind = i % N_KINDS
            assert it["id"] == f"synth_{i}"
            idxs = [p["idx"] for p in it["paragraphs"]]
            assert idxs == list(range(len(idxs))), "idx must be dense"
            sup = [p for p in it["paragraphs"] if p["is_supporting"]]
            if it["answerable"]:
                assert it["answer"], (seed, i, kind)
                assert sup, (seed, i, kind, "answerable needs support")
            else:
                assert it["answer"] == ""
                assert not sup, (seed, i, kind)
            for p in it["paragraphs"]:
                assert p["title"] and p["paragraph_text"]


def test_gold_consistency_per_kind():
    """Kind-specific gold checks: entity answers must surface in a
    supporting paragraph (span kinds); computed answers must be numeric
    or polar; comparative answers must be one of the named options."""
    items = _mk(5)
    for i, it in enumerate(items):
        kind = i % N_KINDS
        if not it["answerable"]:
            continue
        sup_blob = " ".join(p["paragraph_text"] for p in it["paragraphs"]
                            if p["is_supporting"])
        if kind in (10, 13, 23, 24, 27, 37, 39, 40, 48, 52, 56, 59, 60,
                    62, 65, 67, 68, 73, 75, 76, 81, 82, 85, 88,
                    90, 92, 96, 98, 100, 101):  # nums
            assert it["answer"].isdigit(), (i, kind, it["answer"])
        elif kind in (12, 21, 35, 41, 44, 45, 61, 69, 71, 80, 84):  # polarity
            assert it["answer"] in ("yes", "no")
        elif kind == 83:                    # multi-answer: two titles
            parts = it["answer"].split(" and ")
            assert len(parts) == 2, (i, it["answer"])
            titles = " ".join(p["title"] for p in it["paragraphs"]
                              if p["is_supporting"])
            for t in parts:
                assert t in sup_blob or t in titles, (i, t)
        elif kind == 79:                                 # decade surface
            assert re.fullmatch(r"(?:19|20)\d0s", it["answer"]), \
                (i, it["answer"])
        elif kind in (8, 20):                        # comparative: a title
            assert it["answer"] in it["question"] or any(
                it["answer"] in p["paragraph_text"]
                for p in it["paragraphs"] if p["is_supporting"])
        elif kind in (30, 34):                             # time-scoped spouse
            assert it["answer"] in sup_blob, (i, it["answer"])
        else:
            # every other answer surfaces in the support (module titles
            # count: the work-title answers name their own paragraph)
            titles = " ".join(p["title"] for p in it["paragraphs"]
                              if p["is_supporting"])
            assert (it["answer"] in sup_blob or it["answer"] in titles
                    or it["answer"] in it["question"]), \
                (i, kind, it["answer"])


def test_no_intra_item_work_contradictions():
    """WITHIN one item's corpus a work title must never be credited to
    two different performers (each item is a self-contained corpus;
    cross-item surfaces may legitimately differ — kind 16 credits its
    work to a stage name while other items reuse the same world with the
    real name). A same-title contradiction inside one item makes the
    performer hop genuinely ambiguous."""
    perf_re = re.compile(
        r"^(?:(.+?), (?:an album|a record) by (.+?),|"
        r"(.+?) is (?:an album|a record) (?:performed )?by ([^.]+?)\.|"
        r"(.+?) recorded the album ([^.]+?)\.)")
    for seed in (2, 8):
        for it in _mk(seed, n=N_KINDS * 3):
            seen = {}
            for p in it["paragraphs"]:
                t = p["title"]
                if not t.endswith("(album)"):
                    continue
                m = perf_re.match(p["paragraph_text"])
                if not m:
                    continue
                g = [x for x in m.groups() if x]
                if len(g) != 2:
                    continue
                work = t[:-8].strip()
                perf = g[1] if g[0].startswith(work) or work in g[0] \
                    else g[0]
                prev = seen.setdefault(work, perf)
                assert prev == perf, (it["id"], work, prev, perf)


def test_kind21_yes_no_balance():
    """A constant yes/no strategy must not score on the same-city kind."""
    items = _mk(1, n=N_KINDS * 6)
    answers = [it["answer"] for i, it in enumerate(items)
               if i % N_KINDS == 21]
    assert len(set(answers)) == 2, answers


def test_kind84_yes_no_balance():
    """The negative-existence kind draws yes/no ~50/50 — a constant
    strategy must not score 1.0."""
    items = _mk(1, n=N_KINDS * 8)
    answers = [it["answer"] for i, it in enumerate(items)
               if i % N_KINDS == 84]
    assert len(set(answers)) == 2, answers


def test_kind27_rejection_loop_terminates():
    """Regression: with w.year 2019 and the first sibling at 2018, kind
    27's resample interval was [2019, 2020) \\ {w.year} = empty and
    make_items spun forever (hit at n=100, distractors=4, seed=101)."""
    items = make_items(100, distractors=4, seed=101)
    assert len(items) == 100


def test_no_mixed_support_duplicate_titles():
    """Regression (v16): a world picked as extra support (e.g. kind 10's
    worlds[(i+3)%n]) could ALSO be drawn as a regular distractor, adding
    an unlabeled duplicate paragraph the pipeline can legitimately cite
    — support golds corrupted (and kinds 31/39 risked a contradictory
    track-count surface). A title must never appear with BOTH support
    labels inside one item."""
    for seed in (5, 16):
        for it in _mk(seed, n=N_KINDS * 2):
            lab = {}
            for p in it["paragraphs"]:
                prev = lab.setdefault(p["title"], p["is_supporting"])
                assert prev == p["is_supporting"], (it["id"], p["title"])
