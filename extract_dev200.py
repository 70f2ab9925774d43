#!/usr/bin/env python
"""Extract the first-N answerable dev items.

Parity target: /root/reference/extract_dev200.py:8-10.
"""
from __future__ import annotations

import argparse

from anorag_tpu.eval.musique import extract_dev_subset
from anorag_tpu.utils.file_io import read_jsonl, write_jsonl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="full MuSiQue dev jsonl")
    ap.add_argument("output", help="subset jsonl")
    ap.add_argument("-n", type=int, default=200)
    ap.add_argument("--include-unanswerable", action="store_true")
    args = ap.parse_args()
    items = read_jsonl(args.input)
    subset = extract_dev_subset(items, n=args.n,
                                answerable_only=not args.include_unanswerable)
    write_jsonl(args.output, subset)
    print(f"wrote {len(subset)} items -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
