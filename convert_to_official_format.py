#!/usr/bin/env python
"""Convert prediction rows to the official MuSiQue format.

Parity target: /root/reference/convert_to_official_format.py.
"""
from __future__ import annotations

import argparse

from anorag_tpu.eval.musique import convert_to_official_format
from anorag_tpu.utils.file_io import read_jsonl, write_jsonl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args()
    rows = convert_to_official_format(read_jsonl(args.input))
    write_jsonl(args.output, rows)
    print(f"wrote {len(rows)} rows -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
