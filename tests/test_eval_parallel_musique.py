"""Eval metrics, parallel engine/interface, MuSiQue batch pipeline,
calibration."""
import json

import numpy as np
import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.eval.evaluator import EnhancedEvaluator
from anorag_tpu.eval.musique import (
    answer_em, answer_f1, convert_to_official_format, evaluate_dataset,
    extract_dev_subset, support_em, support_f1,
)
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.parallel.engine import ParallelEngine, ParallelTask, Strategy, TaskProcessor
from anorag_tpu.pipeline_musique import MusiqueProcessor, process_musique_item
from anorag_tpu.training.calibrate import AutoCalibrator
from anorag_tpu.utils.file_io import read_jsonl, write_jsonl


# ---------------------------------------------------------------- metrics
def test_answer_em_f1():
    assert answer_em("The Blue Horizon", ["blue horizon"]) == 1.0
    assert answer_em("wrong", ["blue horizon"]) == 0.0
    assert answer_f1("blue horizon album", ["blue horizon"]) == pytest.approx(0.8)
    assert answer_f1("", [""]) == 1.0


def test_support_metrics():
    assert support_em([1, 2], [2, 1]) == 1.0
    assert support_f1([1, 2, 3], [1, 2]) == pytest.approx(0.8)
    assert support_f1([], []) == 1.0
    assert support_f1([1], []) == 0.0


def test_evaluate_dataset_and_official():
    golds = [{"id": "q1", "answer": "Chris Reed",
              "paragraphs": [{"idx": 0, "is_supporting": True},
                             {"idx": 1, "is_supporting": True}]}]
    preds = [{"id": "q1", "predicted_answer": "Chris Reed",
              "predicted_support_idxs": [0, 1]}]
    m = evaluate_dataset(preds, golds)
    assert m["answer_em"] == 1.0 and m["support_em"] == 1.0
    off = convert_to_official_format(preds)
    assert off[0]["id"] == "q1" and off[0]["predicted_answerable"] is True


def test_extract_dev_subset():
    items = [{"id": i, "answerable": i % 2 == 0} for i in range(10)]
    out = extract_dev_subset(items, n=3)
    assert [i["id"] for i in out] == [0, 2, 4]


def test_enhanced_evaluator_metrics():
    golds = [{"id": "q1", "question": "Who is the spouse of Aurora Lane?",
              "answer": "Chris Reed",
              "paragraphs": [{"idx": 1, "is_supporting": True}]}]
    results = [{
        "id": "q1", "predicted_answer": "Chris Reed",
        "predicted_support_idxs": [1],
        "notes": [{"entities": ["Aurora Lane", "Chris Reed"],
                   "content": "Aurora Lane's spouse is Chris Reed.",
                   "paragraph_idxs": [1], "hop_no": 1}],
        "candidate_notes": [{"entities": ["Aurora Lane"], "paragraph_idxs": [1],
                             "hop_no": 2, "bridge_entity": "Aurora Lane",
                             "content": "x"}],
    }]
    m = EnhancedEvaluator().evaluate_batch(results, golds)
    assert m["path_recall_rate"] == 1.0
    assert m["entity_coverage_rate"] == 1.0
    assert m["predicate_consistency_rate"] == 1.0
    assert m["bridge_usage_rate"] == 1.0


# ---------------------------------------------------------------- engine
class EchoProcessor(TaskProcessor):
    task_types = ("echo",)

    def __init__(self, tag):
        self.tag = tag

    def process_single_task(self, task):
        return f"{self.tag}:{task.data}"


class FailProcessor(TaskProcessor):
    task_types = ("echo",)

    def process_single_task(self, task):
        raise RuntimeError("down")


def test_engine_splitting():
    eng = ParallelEngine([EchoProcessor("a"), EchoProcessor("b")],
                         strategy=Strategy.DATA_SPLITTING)
    tasks = [ParallelTask(str(i), "echo", i) for i in range(6)]
    done = eng.process_tasks(tasks)
    assert all(t.error is None for t in done)
    tags = {t.result.split(":")[0] for t in done}
    assert tags == {"a", "b"}
    assert eng.stats.tasks_done == 6


def test_engine_replication_first_success_wins():
    eng = ParallelEngine([FailProcessor(), EchoProcessor("ok")],
                         strategy=Strategy.DATA_REPLICATION)
    done = eng.process_tasks([ParallelTask("0", "echo", "x")])
    assert done[0].result == "ok:x"


def test_engine_hybrid_auto_selects():
    eng = ParallelEngine([EchoProcessor("a")], strategy=Strategy.HYBRID)
    assert eng._select_strategy(
        [ParallelTask(str(i), "echo", i) for i in range(8)]) == Strategy.DATA_SPLITTING
    assert eng._select_strategy(
        [ParallelTask("0", "echo", 0)]) == Strategy.DATA_REPLICATION


# ----------------------------------------------------------- musique e2e
def _cfg():
    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 64)
    loader.set("vector_store.index_type", "Flat")
    loader.set("clustering.n_clusters", 2)
    loader.set("hybrid_search.lexical_fallback.noise_threshold", 0.0)
    return loader


def _musique_item(qid="it1"):
    return {
        "id": qid,
        "question": "Who is the spouse of the performer of Blue Horizon?",
        "answer": "Chris Reed",
        "paragraphs": [
            {"idx": 0, "title": "Blue Horizon",
             "paragraph_text": "Blue Horizon is an album performed by Aurora Lane.",
             "is_supporting": True},
            {"idx": 1, "title": "Aurora Lane",
             "paragraph_text": "Aurora Lane married Chris Reed. Her spouse is Chris Reed.",
             "is_supporting": True},
            {"idx": 2, "title": "Filler",
             "paragraph_text": "The weather in Boston is mild in spring."},
        ],
    }


def test_process_musique_item_end_to_end(tmp_path):
    cfg = _cfg()
    em = EmbeddingManager(cfg=cfg, singleton=False)
    row = process_musique_item(_musique_item(), tmp_path, cfg=cfg,
                               embedding_manager=em)
    assert row["id"] == "it1"
    assert row["predicted_answer"]
    assert isinstance(row["predicted_support_idxs"], list)


def test_musique_processor_resume(tmp_path):
    cfg = _cfg()
    em = EmbeddingManager(cfg=cfg, singleton=False)
    out = tmp_path / "preds.jsonl"
    mp = MusiqueProcessor(tmp_path / "work", cfg=cfg, embedding_manager=em,
                          max_workers=1)
    items = [_musique_item("a"), _musique_item("b")]
    r1 = mp.process_dataset(items[:1], out)
    assert len(r1) == 1
    r2 = mp.process_dataset(items, out, resume=True)
    assert len(r2) == 2
    rows = read_jsonl(out)
    assert {r["id"] for r in rows} == {"a", "b"}
    assert len(rows) == 2  # no duplicate writes on resume


# ------------------------------------------------------------ calibration
def test_autocalibrator_finds_optimum():
    def eval_fn(dev, params):
        # score peaks at complexity_per_k=1.0 and listt5_weight=0.35
        k = (params.get("k_estimator") or {}).get("complexity_per_k", 0)
        w = (params.get("listwise") or {}).get("listt5_weight", 0)
        return -abs(k - 1.0) - abs(w - 0.35)

    cal = AutoCalibrator(eval_fn, spaces={
        "k_estimator": {"complexity_per_k": [0.5, 1.0, 1.5]},
        "listwise": {"listt5_weight": [0.25, 0.35, 0.45]},
    })
    out = cal.calibrate_all_components([{}])
    assert out["components"]["k_estimator"]["complexity_per_k"] == 1.0
    assert out["components"]["listwise"]["listt5_weight"] == 0.35


def test_calibration_persistence(tmp_path):
    cal = AutoCalibrator(lambda d, p: 0.0, spaces={"k_estimator": {"complexity_per_k": [1.0]}})
    cal.calibrate_all_components([{}])
    cal.save_calibration(tmp_path / "calibration.json")
    back = AutoCalibrator.load_calibration(tmp_path / "calibration.json")
    assert "components" in back
