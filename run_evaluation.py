#!/usr/bin/env python
"""Evaluate predictions against MuSiQue gold data.

Parity target: /root/reference/run_evaluation.py (which shells out to the
official MuSiQue evaluator) — the metric math is implemented natively in
anorag_tpu.eval.musique, plus the enhanced internal metrics.
"""
from __future__ import annotations

import argparse
import json

from anorag_tpu.eval.evaluator import EnhancedEvaluator
from anorag_tpu.eval.musique import convert_to_official_format, evaluate_dataset
from anorag_tpu.utils.file_io import read_jsonl, write_jsonl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions", help="predictions jsonl")
    ap.add_argument("gold", help="gold MuSiQue jsonl")
    ap.add_argument("--official-out", default=None,
                    help="also write official-format predictions here")
    ap.add_argument("--enhanced", action="store_true",
                    help="include internal retrieval metrics")
    args = ap.parse_args()

    preds = read_jsonl(args.predictions)
    golds = read_jsonl(args.gold)
    if args.official_out:
        write_jsonl(args.official_out, convert_to_official_format(preds))
    if args.enhanced:
        metrics = EnhancedEvaluator().evaluate_batch(preds, golds)
    else:
        metrics = evaluate_dataset(preds, golds)
    print(json.dumps(metrics, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
