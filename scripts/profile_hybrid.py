#!/usr/bin/env python
"""Stage-split profile of the headline hybrid workload (bench.py config).

Times, on the real chip at 200k x 1024 / B=512 / Zipf terms:
  dense matmul | matmul+approx_max_k | sparse top-m | full hybrid
plus score-matrix dtype variants. Answers "where do the ~10ms go" so
optimization lands where the time is. Forces value reads (tunnel).
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
from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted, sparse_topm_from_sorted
from anorag_tpu.ops.topk import hybrid_topk


def timed(fn, reps=10):
    fn()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return round(1e3 * best, 2)


def main(n=200_000, d=1024, b=512, vocab=30_000, doc_len=40, q_len=8,
         k=100, dense_k=128, sparse_m=64, seed=0):
    rng = np.random.default_rng(seed)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    key = jax.random.PRNGKey(seed)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    doc_terms = make_doc_terms(n, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q_terms = make_query_terms(b, vocab, q_len, rng)
    doc_rows, weight_rows, lens = gather_plan_sorted(postings, q_terms)
    dr = jax.device_put(jnp.asarray(doc_rows))
    wr = jax.device_put(jnp.asarray(weight_rows))
    qd = jax.device_put(jnp.asarray(q, dtype))

    out = {"n": n, "b": b, "L_padded": int(doc_rows.shape[1]),
           "L_mean": int(np.mean(lens)), "backend": jax.default_backend()}

    # every stage reduces its outputs to scalars ON DEVICE — returning the
    # raw arrays times the tunnel transfer (a (B, N) f32 "matmul" read back
    # through np.asarray measured 3.4 s for a ~2 ms matmul)
    mm = jax.jit(lambda e, qq: jnp.sum(
        jnp.dot(qq, e.T, preferred_element_type=jnp.float32)))
    out["dense_matmul_f32out"] = timed(lambda: mm(emb, qd))

    mm_bf = jax.jit(lambda e, qq: jnp.sum(
        jnp.dot(qq, e.T, preferred_element_type=jnp.bfloat16).astype(jnp.float32)))
    out["dense_matmul_bf16out"] = timed(lambda: mm_bf(emb, qd))

    sel = jax.jit(lambda e, qq: jax.lax.approx_max_k(
        jnp.dot(qq, e.T, preferred_element_type=jnp.float32), dense_k,
        recall_target=0.95))
    out["matmul_plus_approx"] = timed(lambda: sel(emb, qd))

    def sp_fn(a, w):
        masked, tv, td, mx = sparse_topm_from_sorted(a, w, sparse_m, n)
        return jnp.sum(tv), jnp.sum(td), jnp.sum(mx)

    out["sparse_topm"] = timed(jax.jit(lambda: sp_fn(dr, wr)))

    # the sparse scan WITHOUT its top-m selection: isolates cumsum/boundary
    def seg_fn(a, w):
        c = jnp.cumsum(w, axis=1)
        nxt = jnp.concatenate([a[:, 1:], jnp.full((b, 1), -1, a.dtype)], axis=1)
        is_end = a != nxt
        end_c = jnp.where(is_end, c, 0.0)
        prev = jnp.concatenate([jnp.zeros((b, 1), c.dtype),
                                jax.lax.cummax(end_c, axis=1)[:, :-1]], axis=1)
        return jnp.sum(jnp.where(is_end & (a < n), c - prev, 0.0))

    out["sparse_segments_only"] = timed(jax.jit(lambda: seg_fn(dr, wr)))

    out["hybrid_full"] = timed(lambda: hybrid_topk(
        emb, qd, dr, wr, k, n_docs=n, dense_k=dense_k, sparse_m=sparse_m,
        sparse_weight=0.6, recall_target=0.95))

    # int8 corpus first-pass variant: selection-only precision loss
    scale = jnp.max(jnp.abs(emb.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
    emb_i8 = jnp.clip(jnp.round(emb.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    qs = np.max(np.abs(q), axis=1, keepdims=True) / 127.0
    q_i8 = jnp.asarray(np.clip(np.round(q / qs), -127, 127).astype(np.int8))
    mm_i8 = jax.jit(lambda e, qq: jnp.sum(jax.lax.dot_general(
        qq, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)))
    out["dense_matmul_int8"] = timed(lambda: mm_i8(emb_i8, q_i8))

    print(json.dumps(out))


def bench_bucketed(n=200_000, d=1024, b=512, vocab=30_000, doc_len=40,
                   q_len=8, k=100, dense_k=128, sparse_m=64, seed=0):
    """Compare hybrid_topk vs hybrid_topk_bucketed on the bench workload."""
    rng = np.random.default_rng(seed)
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    key = jax.random.PRNGKey(seed)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    doc_terms = make_doc_terms(n, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q_terms = make_query_terms(b, vocab, q_len, rng)
    doc_rows, weight_rows, lens = gather_plan_sorted(postings, q_terms)
    dr = jax.device_put(jnp.asarray(doc_rows))
    wr = jax.device_put(jnp.asarray(weight_rows))
    qd = jax.device_put(jnp.asarray(q, dtype))
    from anorag_tpu.ops.topk import hybrid_topk_bucketed, make_bucketed_plan

    out = {"L_padded": int(doc_rows.shape[1]), "L_mean": int(np.mean(lens))}
    out["hybrid_ms"] = timed(lambda: hybrid_topk(
        emb, qd, dr, wr, k, n_docs=n, dense_k=dense_k, sparse_m=sparse_m,
        sparse_weight=0.6, recall_target=0.95))
    kw = dict(k=k, n_docs=n, dense_k=dense_k, sparse_m=sparse_m,
              sparse_weight=0.6, recall_target=0.95)
    plans = {}
    for g in (2, 4, 8):
        t0 = time.perf_counter()
        plans[g] = make_bucketed_plan(doc_rows, weight_rows, lens, n, groups=g)
        out[f"plan_g{g}_s"] = round(time.perf_counter() - t0, 2)
        out[f"bucketed_g{g}_ms"] = timed(
            lambda: hybrid_topk_bucketed(emb, qd, plans[g], **kw))
    # result parity on-chip (same approx seeds -> compare recall overlap)
    _, i1 = hybrid_topk(emb, qd, dr, wr, k, n_docs=n, dense_k=dense_k,
                        sparse_m=sparse_m, sparse_weight=0.6, recall_target=0.95)
    _, i2 = hybrid_topk_bucketed(emb, qd, plans[4], **kw)
    i1, i2 = np.asarray(i1)[:, :10], np.asarray(i2)[:, :10]
    out["top10_overlap"] = round(float(np.mean([
        len(set(i1[j]) & set(i2[j])) / 10 for j in range(b)])), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    if sys.argv[-1] == "bucketed":
        bench_bucketed()
    else:
        main()
