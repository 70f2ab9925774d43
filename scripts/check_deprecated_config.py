#!/usr/bin/env python
"""Scan a config YAML for deprecated / unknown keys.

Parity target: /root/reference/scripts/check_deprecated_config.py:1-9.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from anorag_tpu.config import ConfigLoader


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    args = ap.parse_args()
    with open(args.config) as fh:
        user = yaml.safe_load(fh) or {}
    loader = ConfigLoader(auto_load=False)
    loader.apply_overrides(user)
    print(json.dumps(loader.report(), indent=2))
    return 1 if (loader.unknown_keys or loader.deprecated_hits) else 0


if __name__ == "__main__":
    raise SystemExit(main())
