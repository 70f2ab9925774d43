#!/usr/bin/env python
"""Run the AutoCalibrator loop end-to-end on the synthetic dev set.

The reference workflow (training/calibrate.py:66-356 -> consumed at
query_processor.py:420) searches component parameter grids against a dev
set, persists calibration.json, and the query pipeline loads it at
startup. This script exercises exactly that loop against the v2 synthetic
MuSiQue stand-in:

  1. generate a dev split (separate seed from the driver eval set);
  2. eval_fn = run the LLM-free per-item pipeline with the candidate
     params written to a calibration.json the pipeline itself loads
     (the production ingestion path, not a simulation of it);
  3. AutoCalibrator component + joint coordinate-descent search;
  4. persist the winner to calibration.json;
  5. report the dev-set delta: uncalibrated score vs calibrated score.

Usage: run_calibration.py out_dir [--dev-n 24] [--seed 7]
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gen_synth_musique import make_items  # noqa: E402

from anorag_tpu.config.loader import ConfigLoader  # noqa: E402
from anorag_tpu.eval.musique import evaluate_dataset  # noqa: E402
from anorag_tpu.pipeline_musique import process_musique_item  # noqa: E402
from anorag_tpu.training.calibrate import AutoCalibrator  # noqa: E402
from anorag_tpu.utils.file_io import write_json  # noqa: E402


def make_cfg(calibration_path: str = "") -> ConfigLoader:
    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 256)
    cfg.set("vector_store.index_type", "Flat")
    cfg.set("system.device", "cpu")
    if calibration_path:
        cfg.set("calibration.path", calibration_path)
    return cfg


def run_dev(dev_items, work_root: Path, calibration_path: str = "") -> dict:
    cfg = make_cfg(calibration_path)
    preds = []
    for it in dev_items:
        wd = work_root / str(it["id"])
        if wd.exists():
            shutil.rmtree(wd)
        preds.append(process_musique_item(it, wd, cfg=cfg, llm=None))
    return evaluate_dataset(preds, dev_items)


def score(metrics: dict) -> float:
    # the reference's joint objective shape: answer first, support second
    return metrics["answer_em"] + 0.5 * metrics["support_f1"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--dev-n", type=int, default=24)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--paraphrase-bank", default=None,
                    help="calibrate against a paraphrased dev sheet "
                         "(gen_heldout_musique bank, e.g. v1 — the dev "
                         "bank). The saturated sheet scores EM 1.00 for "
                         "every candidate (delta 0.0 regardless of "
                         "params, VERDICT r3 weak #5); the paraphrased "
                         "sheet discriminates.")
    args = ap.parse_args()
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)

    # force the CPU backend BEFORE any jax use: per-item KBs are tiny and
    # the tunneled-TPU dispatch latency would dominate every eval
    from anorag_tpu.device import apply_device_config

    apply_device_config(make_cfg())

    if args.paraphrase_bank:
        from gen_heldout_musique import make_heldout
        dev = make_heldout(args.dev_n, 8, args.seed,
                           bank=args.paraphrase_bank)
    else:
        dev = make_items(args.dev_n, distractors=8, seed=args.seed)
    # calibrate on answerable items (the unanswerable kind scores a flag,
    # not params); keep them for the final delta report
    dev_ans = [it for it in dev if it.get("answerable", True)]

    n_evals = [0]

    def eval_fn(dev_data, params):
        n_evals[0] += 1
        with tempfile.TemporaryDirectory() as td:
            cal_path = Path(td) / "calibration.json"
            write_json(cal_path, {"components": params})
            m = run_dev(dev_data, Path(td) / "work", str(cal_path))
        s = score(m)
        print(f"  eval #{n_evals[0]}: params={json.dumps(params, sort_keys=True)}"
              f" -> em={m['answer_em']:.3f} supF1={m['support_f1']:.3f} s={s:.4f}",
              flush=True)
        return s

    base_metrics = run_dev(dev_ans, out / "base_work")
    print(f"uncalibrated: em={base_metrics['answer_em']:.3f} "
          f"supF1={base_metrics['support_f1']:.3f} "
          f"score={score(base_metrics):.4f}", flush=True)

    cal = AutoCalibrator(eval_fn, max_trials_per_component=6, seed=args.seed)
    cal.calibrate_all_components(dev_ans)
    cal_path = out / "calibration.json"
    cal.save_calibration(cal_path)

    cal_metrics = run_dev(dev_ans, out / "cal_work", str(cal_path))
    print(f"calibrated:   em={cal_metrics['answer_em']:.3f} "
          f"supF1={cal_metrics['support_f1']:.3f} "
          f"score={score(cal_metrics):.4f}", flush=True)
    delta = score(cal_metrics) - score(base_metrics)
    report = {
        "dev_sheet": (f"paraphrase bank {args.paraphrase_bank}"
                      if args.paraphrase_bank else "saturated synth"),
        "dev_n": len(dev_ans),
        "n_pipeline_evals": n_evals[0],
        "uncalibrated": base_metrics,
        "calibrated": cal_metrics,
        "delta_score": round(delta, 4),
        "components": cal.calibration.get("components", {}),
    }
    write_json(out / "calibration_report.json", report)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
