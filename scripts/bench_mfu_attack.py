#!/usr/bin/env python
"""On-chip experiment battery for the hybrid MFU gap (VERDICT r3 item 3).

Questions, each with a forced-value-read measurement:
  1. PURE DEVICE time of matmul+approx / sparse / full hybrid, with
     dispatch amortized away (fori_loop inside one jit, carry-chained so
     XLA cannot hoist the body).
  2. Per-dispatch cost through the tunnel (tiny-op floor).
  3. Cheaper dense variants: bf16 score matrix for the PartialReduce,
     recall_target sweep, aggregate_to_topk=False.
  4. hybrid_fuse glue cost (dense + fuse with zeroed sparse tables).

Everything passes the corpus as a jit ARGUMENT — a closure-captured
device array is inlined as an HLO constant and a 410 MB constant breaks
the tunnel's remote_compile (broken pipe, observed).

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
from anorag_tpu.ops.topk import hybrid_topk, hybrid_fuse

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


def timed_loop(fn, reps=3):
    """Per-iteration ms of a jitted fn running LOOP_ITERS body iterations
    inside ONE dispatch — the pure-device number."""
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return round(1e3 * best / LOOP_ITERS, 3)


def chained(body):
    """body(qq) -> array; returns run(q) with a hoist-proof fori_loop."""
    def run(q):
        def step(_, carry):
            acc, qq = carry
            out = body(qq)
            s = out.astype(jnp.float32).reshape(-1)[0]
            return acc + s, q + (s * 1e-12).astype(q.dtype)
        acc, _ = jax.lax.fori_loop(0, LOOP_ITERS, step,
                                   (jnp.float32(0.0), q))
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
    emb = jax.block_until_ready(emb)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    doc_terms = make_doc_terms(n, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q_terms = make_query_terms(b, vocab, q_len, rng)
    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    a3, w3 = plan_tiles(doc_rows, weight_rows, n)
    a3d = jax.device_put(jnp.asarray(a3))
    w3d = jax.device_put(jnp.asarray(w3))
    qd = jax.device_put(jnp.asarray(q, dtype))

    out = {"n": n, "b": b, "L_padded": int(doc_rows.shape[1]),
           "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind)}

    def emit(kname, val):
        out[kname] = val
        print(json.dumps({kname: val}), flush=True)

    # 0) dispatch floor
    tiny = jax.jit(lambda x: (x @ x)[0, 0])
    xt = jnp.ones((128, 128), jnp.float32)
    emit("tiny_op_percall_ms", timed(lambda: tiny(xt), reps=20))

    # 1) dense matmul + approx: dispatched vs pure-device
    def mm_approx(e, qq, rt=0.95, agg=True, pet=jnp.float32):
        s = jnp.dot(qq, e.T, preferred_element_type=pet)
        v, _ = jax.lax.approx_max_k(s.astype(jnp.float32), dense_k,
                                    recall_target=rt, aggregate_to_topk=agg)
        return v

    f1 = jax.jit(lambda e, qq: mm_approx(e, qq)[0, 0])
    emit("matmul_approx_rt95_dispatch", timed(lambda: f1(emb, qd)))
    for tag, kw in [("rt95", {}), ("rt97", {"rt": 0.97}),
                    ("rt90", {"rt": 0.90}),
                    ("rt95_noagg", {"agg": False}),
                    ("rt95_bf16scores", {"pet": jnp.bfloat16})]:
        f = jax.jit(lambda e, qq, kw=kw: chained(
            lambda x: mm_approx(e, x, **kw))(qq))
        emit(f"matmul_approx_{tag}_loop", timed_loop(lambda: f(emb, qd)))

    # pure matmul, max epilogue (sum is algebraically rewritable; max not)
    fm = jax.jit(lambda e, qq: chained(
        lambda x: jnp.max(jnp.dot(x, e.T,
                                  preferred_element_type=jnp.float32))[None])(qq))
    emit("matmul_only_loop", timed_loop(lambda: fm(emb, qd)))

    # 2) sparse window kernel
    def sparse_fn(a3x, w3x):
        wv, _, _ = window_winners_tiled(a3x, w3x, n, q_len, b)
        return wv
    f2 = jax.jit(lambda a3x, w3x: sparse_fn(a3x, w3x)[0, 0])
    emit("sparse_window_dispatch", timed(lambda: f2(a3d, w3d)))
    # chain on w3 (float): the perturbation keeps doc ids intact
    f2l = jax.jit(lambda a3x, w3x: chained(
        lambda wx: sparse_fn(a3x, wx))(w3x))
    emit("sparse_window_loop", timed_loop(lambda: f2l(a3d, w3d)))

    # 3) full hybrid (already jitted inside hybrid_topk): dispatched
    emit("hybrid_dispatch", timed(lambda: hybrid_topk(
        emb, qd, a3d, w3d, k, n_docs=n, dense_k=dense_k, sparse_m=sparse_m,
        sparse_weight=0.6, recall_target=0.95, max_seg=q_len)[0]))

    # pure-device hybrid
    def hyb_body(e, a3x, w3x, qq):
        v, _ = hybrid_topk(e, qq, a3x, w3x, k, n_docs=n, dense_k=dense_k,
                           sparse_m=sparse_m, sparse_weight=0.6,
                           recall_target=0.95, max_seg=q_len)
        return v
    f3 = jax.jit(lambda e, a3x, w3x, qq: chained(
        lambda x: hyb_body(e, a3x, w3x, x))(qq))
    emit("hybrid_loop", timed_loop(lambda: f3(emb, a3d, w3d, qd)))

    # 4) dense + fuse glue only (zeroed sparse tables)
    zv = jnp.zeros((b, sparse_m), jnp.float32)
    zd = jnp.full((b, sparse_m), -1, jnp.int32)
    zm = jnp.zeros((b, 1), jnp.float32)
    f4 = jax.jit(lambda e, qq, v_, d_, m_: chained(
        lambda x: hybrid_fuse(e, x, v_, d_, m_, k, n_docs=n,
                              dense_k=dense_k, sparse_weight=0.6,
                              recall_target=0.95)[0])(qq))
    emit("dense_plus_glue_loop", timed_loop(lambda: f4(emb, qd, zv, zd, zm)))

    dense_flops = 2.0 * b * n * d
    for kname in ("hybrid_dispatch", "hybrid_loop"):
        out[f"mfu_{kname}"] = round(
            dense_flops / (out[kname] * 1e-3) / 197e12, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200_000)
