#!/usr/bin/env python
"""Block-size sweep for the window-winners BM25 kernel.

The 1M breakdown (scripts/bench_kernel_breakdown.py) showed the sparse
stage at 10.25 ms for (B=512, L=262144): 1024 grid steps at ~10 us of
Mosaic per-step overhead, while per-step VPU work (<1 us) and DMA
(~1.2 us) are small — the kernel is STEP-COUNT-bound.  Bigger blocks cut
steps linearly until VMEM runs out (~16 MB; inputs + winner scratch +
concat temporaries ~24-32 B/element).

Usage: bench_window_blocks.py [n_docs] [batch]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, rounds=20, blocks=3):
    import jax

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(np.asarray(leaf.reshape(-1)[:1])[0])

    force(fn())
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn()
        force(out)
        best = min(best, time.perf_counter() - t0)
    return best / rounds


def synth_plan(b, l, n, q_len, rng):
    """Fabricate sorted plan rows directly (the real host build at 1M takes
    many minutes single-core; kernel timing only needs the SHAPE and the
    <= max_seg repeat structure)."""
    docs = np.sort(rng.integers(0, n, size=(b, l)), axis=1).astype(np.int32)
    w = rng.random((b, l)).astype(np.float32) + 0.1
    return docs, w


def main():
    import jax

    from anorag_tpu.ops.bm25 import (plan_tiles, window_winners_tiled,
                                     _winners_select)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    l = int(sys.argv[3]) if len(sys.argv) > 3 else 262_144
    q_len, m = 8, 64
    rng = np.random.default_rng(0)
    doc_rows, weight_rows = synth_plan(b, l, n, q_len, rng)
    print(f"n={n} b={b} L={doc_rows.shape[1]}", flush=True)

    # fresh-compile cost over the tunnel is 60-120s per config: keep the
    # matrix small (block_b fixed at the known-good 128)
    block_ls = ([int(x) for x in sys.argv[4].split(",")]
                if len(sys.argv) > 4 else [1024, 4096, 8192])
    ref = None
    for block_l in block_ls:
        a3, w3 = plan_tiles(doc_rows, weight_rows, n, block_l=block_l)
        a3 = jax.device_put(a3)
        w3 = jax.device_put(w3)
        for block_b in (128,):
            if block_b > b:
                continue
            steps = (b // block_b) * a3.shape[0]
            try:
                run = jax.jit(lambda a3=a3, w3=w3, bb=block_b: _winners_select(
                    *window_winners_tiled(a3, w3, n, max_seg=q_len,
                                          b_valid=b, block_b=bb), m))
                dt = timeit(run)
                tv, td, mx = jax.tree.map(np.asarray, run())
                if ref is None:
                    ref = (tv, td)
                    match = 1.0
                else:
                    match = float(np.mean(np.sort(tv, axis=1)
                                          == np.sort(ref[0], axis=1)))
                print(f"block_l={block_l:5d} block_b={block_b:3d} "
                      f"steps={steps:5d}  {dt*1e3:7.2f} ms  "
                      f"val-match={match:.4f}", flush=True)
            except Exception as e:
                print(f"block_l={block_l:5d} block_b={block_b:3d} "
                      f"steps={steps:5d}  FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
