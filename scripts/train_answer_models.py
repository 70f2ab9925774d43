#!/usr/bin/env python
"""Train SpanPicker / QACoverageScorer / AnswerVerifier heads on synthetic
supervision and write (or merge into) calibration.json, the file
`calibration.path` points QueryProcessor at (ref training/calibrate.py:197
persists trained component weights the query path consumes)."""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from anorag_tpu.training.answer_models import train_answer_models
from anorag_tpu.utils.file_io import read_json, write_json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./result/calibration.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    comps = train_answer_models(seed=args.seed)
    out = Path(args.out)
    cal = read_json(out) if out.exists() else {}
    cal.setdefault("components", {}).update(comps)
    write_json(out, cal)
    for name, c in comps.items():
        print(f"{name}: train_acc={c['train_acc']:.3f}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
