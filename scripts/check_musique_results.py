#!/usr/bin/env python
"""Result sanity checks.

Parity target: /root/reference/scripts/check_musique_results.py:1-9 —
forbidden-word ratio, empty-answer ratio, support length ~2-3, and
answer-substring-of-support heuristics over a predictions jsonl.
"""
from __future__ import annotations

import argparse
import json

from anorag_tpu.utils.file_io import read_jsonl

FORBIDDEN = ("insufficient information", "i don't know", "cannot answer", "unknown")


def check(rows):
    n = max(len(rows), 1)
    empty = sum(1 for r in rows if not (r.get("predicted_answer") or "").strip())
    forbidden = sum(
        1 for r in rows
        if any(f in (r.get("predicted_answer") or "").lower() for f in FORBIDDEN)
    )
    sup_lens = [len(r.get("predicted_support_idxs") or []) for r in rows]
    in_range = sum(1 for l in sup_lens if 2 <= l <= 4)
    return {
        "n": len(rows),
        "empty_answer_ratio": empty / n,
        "forbidden_ratio": forbidden / n,
        "avg_support_len": sum(sup_lens) / n,
        "support_len_2_to_4_ratio": in_range / n,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions")
    args = ap.parse_args()
    print(json.dumps(check(read_jsonl(args.predictions)), indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
