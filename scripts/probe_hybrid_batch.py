#!/usr/bin/env python
"""On-chip probe: hybrid MFU vs batch size + approx sparse select.

VERDICT r3 next-step #3 wants 200k hybrid >= 0.35 MFU. The r3 headline
(b=512) pays ~1.6 ms/call tunnel dispatch + a full corpus HBM sweep per
512 queries; raising the batch amortizes both and fills the MXU M dim.
This probe measures latency/MFU/recall@10 (128-query f32 device oracle)
across batch sizes so the bench headline batch is chosen from data, not
guessed. Run on the real chip: python scripts/probe_hybrid_batch.py
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def main() -> int:
    import jax

    print(json.dumps({"backend": jax.default_backend(),
                      "device": jax.devices()[0].device_kind}), flush=True)
    out = []
    for b in (512, 1024, 2048, 4096):
        r = bench.bench_hybrid(200_000, b=b, rounds=max(4, 2048 // b),
                               cpu_baseline=False, oracle_queries=128)
        row = {"b": b, "latency_ms": r["latency_ms_per_batch"],
               "qps": r["qps"], "mfu": r["mfu"],
               "recall@10": r.get("recall_at_10_vs_exact_f32")}
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": out}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
