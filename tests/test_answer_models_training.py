"""Trained answer-path heads (ref answer/span_picker.py:382,
reasoning/qa_coverage.py trained model, verify_shell trainable head):
training on synthetic supervision must beat the fixed heuristic weights
on HELD-OUT entities, and calibration must flow into QueryProcessor."""
import numpy as np
import pytest

from anorag_tpu.answer.span_picker import SpanPicker
from anorag_tpu.answer.verifier import AnswerVerifier
from anorag_tpu.reasoning.qa_coverage import QACoverageScorer
from anorag_tpu.training.answer_models import (
    PEOPLE,
    WORKS,
    _rows,
    synthetic_coverage_pairs,
    synthetic_span_examples,
    synthetic_verifier_examples,
    train_answer_models,
)


@pytest.fixture(scope="module")
def comps():
    return train_answer_models(seed=0)  # trains on PEOPLE[:8] x WORKS[:6]


def _heldout_rows():
    rng = np.random.default_rng(9)
    return _rows(rng, PEOPLE[8:], WORKS[6:],
                 ["Quito", "Bergen"], ["1973", "2004"])


def test_training_accuracies(comps):
    for name in ("span_picker", "qa_coverage", "verifier"):
        assert comps[name]["train_acc"] >= 0.9, (name, comps[name]["train_acc"])


def _span_pick_accuracy(picker, rows):
    hits = 0
    for r in rows:
        ctx = f"{r['offtopic']} {r['sent']}"
        best = picker.pick_best_span(r["q"], ctx)
        hits += bool(best and best["span"] == r["span"])
    return hits / len(rows)


def test_span_picker_trained_beats_heuristic_on_heldout(comps):
    rows = _heldout_rows()
    heur = SpanPicker()
    trained = SpanPicker()
    assert trained.load_calibration({"span_picker": comps["span_picker"]})
    acc_h = _span_pick_accuracy(heur, rows)
    acc_t = _span_pick_accuracy(trained, rows)
    assert acc_t >= acc_h
    assert acc_t >= 0.9, (acc_h, acc_t)


def _coverage_accuracy(scorer, rows):
    hits = 0
    for r in rows:
        hits += scorer.score(r["q"], r["sent"]) > scorer.score(r["q"], r["offtopic"])
    return hits / len(rows)


def test_qa_coverage_trained_beats_heuristic_on_heldout(comps):
    rows = _heldout_rows()
    heur = QACoverageScorer()
    trained = QACoverageScorer()
    assert trained.load_calibration({"qa_coverage": comps["qa_coverage"]})
    assert _coverage_accuracy(trained, rows) >= _coverage_accuracy(heur, rows)
    assert _coverage_accuracy(trained, rows) >= 0.95


def test_verifier_trained_separates_on_heldout(comps):
    rows = _heldout_rows()
    rng = np.random.default_rng(1)
    v = AnswerVerifier()
    assert v.load_calibration(comps)
    ex = synthetic_verifier_examples(rows, rng)
    preds = [(v.verify_score(q, a, c) > 0.5) == (lab > 0.5) for q, a, c, lab in ex]
    assert np.mean(preds) >= 0.9


def test_calibration_flows_into_query_processor(tmp_path, comps):
    from tests.test_query_processor import _cfg, _kb_notes

    from anorag_tpu.query.processor import QueryProcessor
    from anorag_tpu.utils.file_io import write_json

    path = tmp_path / "calibration.json"
    write_json(path, {"components": comps})
    cfg = _cfg(**{"calibration.path": str(path)})
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=None)
    assert qp.verifier.w is not None               # entailment head loaded
    assert qp.verifier.span_picker.w is not None   # span head loaded
    res = qp.process("Who is the spouse of the performer of Blue Horizon?")
    assert res["answer"]


def test_joint_optimization_multi_round():
    from anorag_tpu.training.calibrate import AutoCalibrator

    # landscape whose improvement chain (A->1, B->1, A->2, B->2, A->0)
    # is longer than one A-then-B sweep: only a SECOND joint round finds
    # the optimum at (0, 2)
    table = {(0, 0): 0.1, (1, 0): 0.3, (2, 0): 0.2,
             (1, 1): 0.5, (0, 1): 0.2, (2, 1): 0.6,
             (2, 2): 0.7, (1, 2): 0.4, (0, 2): 1.0}

    def eval_fn(dev, params):
        a = (params.get("A") or {}).get("x", 0)
        b = (params.get("B") or {}).get("y", 0)
        return table.get((a, b), 0.05)

    cal = AutoCalibrator(eval_fn, spaces={"A": {"x": [0, 1, 2]},
                                          "B": {"y": [0, 1, 2]}})
    out = cal.calibrate_all_components([{}])
    assert out["joint_score"] == 1.0
    assert out["components"]["A"]["x"] == 0 and out["components"]["B"]["y"] == 2


def test_script_writes_and_merges(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "calibration.json"
    from anorag_tpu.utils.file_io import read_json, write_json

    write_json(out, {"components": {"listwise": {"listt5_weight": 0.35}}})
    r = subprocess.run(
        [sys.executable, "scripts/train_answer_models.py", "--out", str(out)],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    cal = read_json(out)
    assert "span_picker" in cal["components"]
    assert cal["components"]["listwise"]["listt5_weight"] == 0.35  # merged


def test_structure_packing_is_default_and_qa_head_loads(tmp_path, comps):
    from tests.test_query_processor import _cfg, _kb_notes

    from anorag_tpu.query.processor import QueryProcessor
    from anorag_tpu.utils.file_io import write_json

    path = tmp_path / "calibration.json"
    write_json(path, {"components": comps})
    qp = QueryProcessor(_kb_notes(), cfg=_cfg(**{"calibration.path": str(path)}),
                        llm=None)
    assert qp.packer.use_structure and qp.packer.structure_packer is not None
    assert qp.qa_scorer is not None and qp.qa_scorer.w is not None
    # legacy opt-out honored
    qp2 = QueryProcessor(_kb_notes(),
                         cfg=_cfg(**{"context.use_legacy_packing": True}), llm=None)
    assert not qp2.packer.use_structure
