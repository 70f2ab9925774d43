#!/usr/bin/env python
"""TRUE device-time measurement of the hybrid stages via chained-loop
linear fit (VERDICT r3 item 3 resolution).

bench_dispatch_anatomy proved the tunnel's blocking dispatch round-trip
is ~22-30 ms TODAY (vs ~1.6 ms in earlier sessions) and that dividing a
single dispatch by LOOP_ITERS poisons every per-iteration reading. The
honest estimator: run the body chained inside one jit at iters=8 and
iters=32 and fit  time(iters) = fixed + iters * per_iter.  per_iter is
pure device compute, independent of tunnel state.

Measures dense / sparse / dense+glue / full hybrid at b in {512, 2048}.

Usage: python scripts/bench_true_device.py [n_docs]
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

from bench import make_doc_terms, make_query_terms
from anorag_tpu.ops.bm25 import (build_postings, gather_plan_sorted,
                                 plan_tiles, sparse_topm_winners)
from anorag_tpu.ops.topk import hybrid_topk, hybrid_fuse


def timed(fn, reps=4):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return 1e3 * best


def chained(body, iters):
    def run(q):
        def step(_, carry):
            acc, qq = carry
            out = body(qq)
            s = out.astype(jnp.float32).reshape(-1)[0]
            return acc + s, q + (s * 1e-12).astype(q.dtype)
        acc, _ = jax.lax.fori_loop(0, iters, step,
                                   (jnp.float32(0.0), q))
        return acc
    return run


def fit_per_iter(make_fn, args):
    t8 = timed(lambda: make_fn(8)(*args))
    t32 = timed(lambda: make_fn(32)(*args))
    per_iter = (t32 - t8) / 24.0
    fixed = t8 - 8 * per_iter
    return round(per_iter, 3), round(fixed, 1)


def main(n=200_000, d=1024, vocab=30_000, doc_len=40, q_len=8,
         k=100, dense_k=128, sparse_m=64, rt=0.95, seed=0):
    rng = np.random.default_rng(seed)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(seed)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    emb = jax.block_until_ready(emb)
    doc_terms = make_doc_terms(n, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)

    out = {"n": n, "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind)}

    def emit(kname, val):
        out[kname] = val
        print(json.dumps({kname: val}), flush=True)

    for b in (512, 2048):
        q = rng.standard_normal((b, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        qd = jax.device_put(jnp.asarray(q, dtype))
        q_terms = make_query_terms(b, vocab, q_len, rng)
        doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
        a3, w3 = plan_tiles(doc_rows, weight_rows, n)
        a3d = jax.device_put(jnp.asarray(a3))
        w3d = jax.device_put(jnp.asarray(w3))
        sol_ms = 2.0 * b * n * d / 197e12 * 1e3

        # dense
        def mk_dense(iters):
            return jax.jit(lambda e, qq, it=iters: chained(
                lambda x: jax.lax.approx_max_k(
                    jnp.dot(x, e.T, preferred_element_type=jnp.float32),
                    dense_k, recall_target=rt)[0], it)(qq))
        pi, fx = fit_per_iter(mk_dense, (emb, qd))
        emit(f"b{b}_dense_per_iter_ms", pi)
        emit(f"b{b}_dense_mfu", round(sol_ms / pi, 4))

        # sparse winners + select
        def mk_sparse(iters):
            def body(wx):
                tv, td, mx = sparse_topm_winners(
                    a3d, wx, sparse_m, n, max_seg=q_len, b_valid=b,
                    select_approx=True)
                return tv
            return jax.jit(lambda a3x, w3x, it=iters: chained(body, it)(w3x))
        pi_s, _ = fit_per_iter(mk_sparse, (a3d, w3d))
        emit(f"b{b}_sparse_per_iter_ms", pi_s)

        # full hybrid
        def mk_hyb(iters):
            def body(x):
                v, _ = hybrid_topk(emb, x, a3d, w3d, k, n_docs=n,
                                   dense_k=dense_k, sparse_m=sparse_m,
                                   sparse_weight=0.6, recall_target=rt,
                                   max_seg=q_len)
                return v
            return jax.jit(lambda e, a3x, w3x, qq, it=iters: chained(
                body, it)(qq))
        pi_h, fx_h = fit_per_iter(mk_hyb, (emb, a3d, w3d, qd))
        emit(f"b{b}_hybrid_per_iter_ms", pi_h)
        emit(f"b{b}_hybrid_mfu_device", round(sol_ms / pi_h, 4))
        emit(f"b{b}_hybrid_fixed_dispatch_ms", fx_h)
        emit(f"b{b}_hybrid_device_qps", round(b / (pi_h * 1e-3), 1))

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    main(n)
