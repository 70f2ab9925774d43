#!/usr/bin/env python
"""IVFPQ bench at 2M x 1024 on the real TPU: recall@10 vs flat, QPS,
memory reduction (VERDICT r1 item 4 'Done =' contract).

Data is clustered (4096 centers + noise, row-normalized) — the structure
real sentence embeddings have and PQ codebooks assume; pure iid gaussian
would understate PQ recall for no operational reason.

Timing forces a value read (float(v[0,0])) — block_until_ready on the
tunneled TPU can return before work drains (CLAUDE.md kernel facts).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from anorag_tpu.ops.pq import encode_pq, pq_lut, pq_search, pq_topk, train_pq
from anorag_tpu.ops.topk import dense_topk


def main(n=2_000_000, d=1024, m=128, b=256, k=10, candidates=1000, seed=0):
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    centers = rng.standard_normal((4096, d)).astype(np.float32)
    emb = np.empty((n, d), np.float32)
    chunk = 250_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        ids = rng.integers(0, len(centers), hi - lo)
        emb[lo:hi] = centers[ids] + 0.35 * rng.standard_normal((hi - lo, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    queries = emb[rng.integers(0, n, b)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    print(f"data: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # ---- train + encode --------------------------------------------------
    t0 = time.perf_counter()
    cb = train_pq(emb, m=m, n_centroids=256, iters=10, sample=131072, seed=seed)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    codes_np = encode_pq(emb, cb, chunk=131072)
    t_encode = time.perf_counter() - t0
    codes = jnp.asarray(codes_np)
    print(f"train {t_train:.1f}s encode {t_encode:.1f}s", file=sys.stderr)

    # ---- flat bf16 baseline (the thing PQ is compared to) ---------------
    emb_dev = jnp.asarray(emb, jnp.bfloat16)
    qd = jnp.asarray(queries, jnp.bfloat16)
    fv, fi = dense_topk(emb_dev, qd, k, method="exact")  # exact flat oracle
    _ = float(np.asarray(fv)[0, 0])
    exact_ids = np.asarray(fi)

    def timed(fn, reps=5):
        fn()  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = float(np.asarray(out[0]).reshape(-1)[0])  # force drain
        return (time.perf_counter() - t0) / reps

    t_flat = timed(lambda: dense_topk(emb_dev, qd, k, method="approx"))
    fav, fai = dense_topk(emb_dev, qd, k, method="approx")
    flat_recall = float(np.mean([
        len(set(np.asarray(fai)[i]) & set(exact_ids[i])) / k for i in range(b)]))
    # free the 4GB flat corpus before the compressed scans: HBM pressure
    # from co-resident flat + codes thrashed the first 2M run (SQ scan read
    # 1.6s vs 20ms with the corpus freed)
    del emb_dev, qd, fav, fai
    import gc

    gc.collect()

    # ---- codebook PQ scan + refine ---------------------------------------
    cb_dev = jnp.asarray(cb, jnp.float32)
    q_dev = jnp.asarray(queries)

    def pq_scan():
        lut = pq_lut(q_dev, cb_dev)
        return pq_topk(codes, lut, candidates)

    t_scan = timed(pq_scan, reps=2)
    t0 = time.perf_counter()
    for _ in range(2):
        pv, pi = pq_search(codes, cb, queries, k, emb_host=emb,
                           candidates=candidates)
    t_pq_full = (time.perf_counter() - t0) / 2
    pq_recall = float(np.mean([
        len(set(pi[i]) & set(exact_ids[i])) / k for i in range(b)]))

    # ---- rotated int8 sketch scan + refine --------------------------------
    from anorag_tpu.ops.sq import encode_sq, sq_quantize_queries, sq_search, sq_topk, train_sq

    t0 = time.perf_counter()
    rot = train_sq(emb, r=m, sample=131072, seed=seed)
    t_sq_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    sq_codes_np, sq_scales_np = encode_sq(emb, rot)
    t_sq_encode = time.perf_counter() - t0
    sq_codes = jnp.asarray(sq_codes_np)
    sq_scales = jnp.asarray(sq_scales_np)
    qc, qs = sq_quantize_queries(queries, rot)

    t_sq_scan = timed(lambda: sq_topk(sq_codes, sq_scales, qc, qs, candidates))
    t0 = time.perf_counter()
    for _ in range(3):
        sv, si = sq_search(sq_codes, sq_scales, rot, queries, k,
                           emb_host=emb, candidates=candidates)
    t_sq_full = (time.perf_counter() - t0) / 3
    sq_recall = float(np.mean([
        len(set(si[i]) & set(exact_ids[i])) / k for i in range(b)]))

    code_bytes = codes_np.nbytes
    sq_bytes = sq_codes_np.nbytes + sq_scales_np.nbytes
    flat_bytes = n * d * 2  # bf16
    out = {
        "bench": "pq_2m",
        "n": n, "d": d, "m": m, "batch": b, "k": k, "candidates": candidates,
        "flat_approx_recall_at_10": round(flat_recall, 4),
        "flat_approx_ms": round(t_flat * 1e3, 2),
        "flat_qps": round(b / t_flat, 1),
        "pq_recall_at_10_vs_flat_exact": round(pq_recall, 4),
        "pq_scan_ms": round(t_scan * 1e3, 2),
        "pq_search_full_ms": round(t_pq_full * 1e3, 2),
        "pq_qps": round(b / t_pq_full, 1),
        "pq_memory_reduction_x": round(flat_bytes / code_bytes, 1),
        "pq_train_s": round(t_train, 1), "pq_encode_s": round(t_encode, 1),
        "sq_recall_at_10_vs_flat_exact": round(sq_recall, 4),
        "sq_scan_ms": round(t_sq_scan * 1e3, 2),
        "sq_search_full_ms": round(t_sq_full * 1e3, 2),
        "sq_qps": round(b / t_sq_full, 1),
        "sq_memory_reduction_x": round(flat_bytes / sq_bytes, 1),
        "sq_train_s": round(t_sq_train, 1), "sq_encode_s": round(t_sq_encode, 1),
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--candidates", type=int, default=100)
    a = ap.parse_args()
    main(n=a.n, m=a.m, b=a.batch, candidates=a.candidates)
