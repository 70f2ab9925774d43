#!/usr/bin/env python
"""On-chip experiment battery for the hybrid MFU gap (VERDICT r3 item 3).

Questions this answers, each with a forced-value-read measurement:
  1. What is the PURE DEVICE time of matmul+approx / sparse / full hybrid,
     with dispatch amortized away (fori_loop inside one jit, carry-chained
     so XLA cannot hoist the loop body)?
  2. What does one dispatch cost through the tunnel (tiny-op floor)?
  3. Do cheaper dense variants hold recall: bf16 score matrix for the
     PartialReduce, lower recall_target, aggregate_to_topk=False?
  4. Where does hybrid_fuse's glue go (einsum cross-score vs eq-match)?

Usage: python scripts/bench_mfu_attack.py [n_docs] (default 200000)
"""
from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import make_doc_terms, make_query_terms
from anorag_tpu.ops.bm25 import (build_postings, gather_plan_sorted,
                                 plan_tiles, window_winners_tiled)
from anorag_tpu.ops.topk import hybrid_topk

LOOP_ITERS = 8


def timed(fn, reps=10):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return round(1e3 * best, 3)


def timed_loop(jitted, reps=3):
    """Per-iteration ms of a jitted fn whose body runs LOOP_ITERS times
    inside one dispatch — the pure-device number."""
    jitted()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jitted()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return round(1e3 * best / LOOP_ITERS, 3)


def chained_loop(body):
    """fori_loop whose carry perturbs the input each iter (hoist-proof)."""
    def run(q):
        def step(_, carry):
            acc, qq = carry
            out = body(qq)
            s = out.astype(jnp.float32).reshape(-1)[0]
            return acc + s, q + (s * 1e-12).astype(q.dtype)
        acc, _ = jax.lax.fori_loop(0, LOOP_ITERS, step, (jnp.float32(0.0), q))
        return acc
    return run


def main(n=200_000, d=1024, b=512, vocab=30_000, doc_len=40, q_len=8,
         k=100, dense_k=128, sparse_m=64, seed=0):
    rng = np.random.default_rng(seed)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(seed)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    doc_terms = make_doc_terms(n, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q_terms = make_query_terms(b, vocab, q_len, rng)
    doc_rows, weight_rows, lens = gather_plan_sorted(postings, q_terms)
    a3, w3 = plan_tiles(doc_rows, weight_rows, n)
    a3d = jax.device_put(jnp.asarray(a3))
    w3d = jax.device_put(jnp.asarray(w3))
    qd = jax.device_put(jnp.asarray(q, dtype))

    out = {"n": n, "b": b, "L_padded": int(doc_rows.shape[1]),
           "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind)}

    # 0) dispatch floor: tiny matmul, per-call
    tiny = jax.jit(lambda x: (x @ x)[0, 0])
    xt = jnp.ones((128, 128), jnp.float32)
    out["tiny_op_percall_ms"] = timed(lambda: tiny(xt), reps=20)

    # 1) dense matmul + approx: dispatched vs in-loop (pure device)
    def mm_approx(qq, rt=0.95, agg=True, pet=jnp.float32):
        s = jnp.dot(qq, emb.T, preferred_element_type=pet)
        v, i = jax.lax.approx_max_k(s.astype(jnp.float32), dense_k,
                                    recall_target=rt,
                                    aggregate_to_topk=agg)
        return v

    out["matmul_approx_rt95_dispatch"] = timed(
        jax.jit(lambda qq: mm_approx(qq)[0, 0]).lower(qd).compile())
    for tag, kw in [("rt95", {}), ("rt97", {"rt": 0.97}),
                    ("rt90", {"rt": 0.90}),
                    ("rt95_noagg", {"agg": False}),
                    ("rt95_bf16scores", {"pet": jnp.bfloat16})]:
        f = jax.jit(chained_loop(lambda qq, kw=kw: mm_approx(qq, **kw)))
        out[f"matmul_approx_{tag}_loop"] = timed_loop(lambda: f(qd))

    # pure matmul in-loop (max epilogue — sum could be algebraically
    # rewritten by XLA; max cannot)
    f = jax.jit(chained_loop(
        lambda qq: jnp.max(jnp.dot(qq, emb.T,
                                   preferred_element_type=jnp.float32))[None]))
    out["matmul_only_loop"] = timed_loop(lambda: f(qd))

    # 2) sparse window kernel: dispatched vs in-loop
    def sparse_fn(w3x):
        wv, wd, mx = window_winners_tiled(a3d, w3x, n, q_len, b)
        return wv
    out["sparse_window_dispatch"] = timed(
        jax.jit(lambda w3x: sparse_fn(w3x)[0, 0]).lower(w3d).compile())
    f = jax.jit(chained_loop(sparse_fn))
    out["sparse_window_loop"] = timed_loop(lambda: f(w3d))

    # 3) full hybrid: dispatched vs in-loop
    def hyb(qq):
        v, i = hybrid_topk(emb, qq, a3d, w3d, k, n_docs=n, dense_k=dense_k,
                           sparse_m=sparse_m, sparse_weight=0.6,
                           recall_target=0.95, max_seg=q_len)
        return v
    out["hybrid_dispatch"] = timed(lambda: hyb(qd))
    f = jax.jit(chained_loop(hyb))
    out["hybrid_loop"] = timed_loop(lambda: f(qd))

    # 4) hybrid minus sparse (dense + fuse glue only, zero sparse tables)
    from anorag_tpu.ops.topk import hybrid_fuse
    zv = jnp.zeros((b, sparse_m), jnp.float32)
    zd = jnp.full((b, sparse_m), -1, jnp.int32)
    zm = jnp.zeros((b, 1), jnp.float32)
    def dense_fuse(qq):
        v, i = hybrid_fuse(emb, qq, zv, zd, zm, k, n_docs=n,
                           dense_k=dense_k, sparse_weight=0.6,
                           recall_target=0.95)
        return v
    f = jax.jit(chained_loop(dense_fuse))
    out["dense_plus_glue_loop"] = timed_loop(lambda: f(qd))

    # MFU arithmetic
    dense_flops = 2.0 * b * n * d
    for kname in ("hybrid_dispatch", "hybrid_loop"):
        out[f"mfu_{kname}"] = round(
            dense_flops / (out[kname] * 1e-3) / 197e12, 4)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
