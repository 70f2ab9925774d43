#!/usr/bin/env python
"""LSH + HNSW bench on the real TPU / host (docs/kernels.md numbers).

Workloads:
  * LSH (ops/lsh.py): 200k x 1024 clustered corpus, B=256 — sign-sketch
    scan (±1 int8 MXU matmul) + exact refine, at 1024 and 512 bits;
    recall@10 vs exact flat, vs the bf16 flat approx scan.
  * HNSW (native C++): same corpus, the SMALL-batch regime (B=8) it
    exists for — build time, per-query latency vs the flat device scan
    (which pays one tunnel dispatch per batch).

Timing forces a value read (float(...)) — block_until_ready on tunneled
TPUs can return before work drains (CLAUDE.md kernel facts).
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

from anorag_tpu.ops.topk import dense_topk


def make_data(n, d, b, rng):
    centers = rng.standard_normal((2048, d)).astype(np.float32)
    emb = np.empty((n, d), np.float32)
    chunk = 250_000
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        ids = rng.integers(0, len(centers), hi - lo)
        emb[lo:hi] = centers[ids] + 0.35 * rng.standard_normal((hi - lo, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, n, b)] + 0.05 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q


def timed(fn, reps=5):
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _ = float(np.asarray(out[0]).reshape(-1)[0])
    return (time.perf_counter() - t0) / reps


def recall(got, exact, k):
    return float(np.mean([
        len(set(got[i][:k]) & set(exact[i][:k])) / k for i in range(len(exact))]))


def main(n=200_000, d=1024, b=256, k=10, seed=0):
    rng = np.random.default_rng(seed)
    t_all = time.perf_counter()

    def phase(msg):
        print(f"[{time.perf_counter()-t_all:7.1f}s] {msg}", file=sys.stderr, flush=True)

    emb, q = make_data(n, d, b, rng)
    phase("data ready")
    out = {"n": n, "d": d, "batch": b, "backend": jax.default_backend()}

    # exact oracle + flat approx baseline
    emb_dev = jnp.asarray(emb, jnp.bfloat16)
    qd = jnp.asarray(q, jnp.bfloat16)
    _, fi = dense_topk(emb_dev, qd, k, method="exact")
    exact_ids = np.asarray(fi)
    phase("exact oracle done")
    t_flat = timed(lambda: dense_topk(emb_dev, qd, k, method="approx"))
    _, fa = dense_topk(emb_dev, qd, k, method="approx")
    out["flat_bf16"] = {"ms_per_batch": round(1e3 * t_flat, 2),
                        "recall_at_10": recall(np.asarray(fa), exact_ids, k),
                        "bytes_per_row": 2 * d}
    phase("flat approx done")

    # LSH at two bit widths
    from anorag_tpu.ops.lsh import encode_lsh, lsh_search, train_lsh

    for bits in (d, d // 2):
        planes = train_lsh(d, bits, seed=seed)
        t0 = time.perf_counter()
        codes = jnp.asarray(encode_lsh(emb, planes))
        t_enc = time.perf_counter() - t0
        cand = max(4 * k, n // 500, 64)
        # device refine (ops/pq.py::device_refine): host refine measured
        # 0.5-6 s/batch256 on this single-core host
        t_lsh = timed(lambda: lsh_search(codes, planes, q, k,
                                         emb_dev=emb_dev, candidates=cand), reps=3)
        _, li = lsh_search(codes, planes, q, k, emb_dev=emb_dev, candidates=cand)
        out[f"lsh_{bits}b"] = {
            "ms_per_batch": round(1e3 * t_lsh, 2),
            "recall_at_10": recall(li, exact_ids, k),
            "encode_s": round(t_enc, 2),
            "bytes_per_row": bits,
            "refine_pool": cand,
        }
        phase(f"lsh {bits}b done")

    # HNSW: small-batch regime. The build is multi-threaded with per-node
    # locks, but THIS rig has a single host core (nproc=1) — bench a 50k
    # subset so the single-core build fits the budget; scale build_s
    # linearly in n (and divide by cores on attached hardware).
    from anorag_tpu import native

    if native.available():
        nh = min(n, 50_000)
        phase("hnsw build start")
        t0 = time.perf_counter()
        h = native.HNSWNative(emb[:nh], m=16, ef_construction=100, seed=seed)
        t_build = time.perf_counter() - t0
        phase("hnsw build done")
        bs = 8
        qs = q[:bs]
        exact_s = np.argsort(-(qs @ emb[:nh].T), axis=1)[:, :k]
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            hs, hi = h.search(qs, k, ef_search=96)
        t_h = (time.perf_counter() - t0) / reps
        qsd = jnp.asarray(qs, jnp.bfloat16)
        emb_small = jnp.asarray(emb[:nh], jnp.bfloat16)  # same corpus as hnsw
        t_flat_small = timed(lambda: dense_topk(emb_small, qsd, k, method="approx"))
        out["hnsw"] = {
            "n": nh,
            "build_s": round(t_build, 1),
            "host_cores": __import__("os").cpu_count(),
            "batch": bs,
            "ms_per_batch": round(1e3 * t_h, 2),
            "recall_at_10": recall(hi, exact_s, k),
            "flat_small_batch_ms": round(1e3 * t_flat_small, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
