#!/usr/bin/env python
"""Benchmark: hybrid-query (dense + BM25, v2 fusion) QPS per chip.

The headline workload from BASELINE.md: over an atomic-notes corpus
(N x 1024, MuSiQue-scale vocabulary), answer query batches with
  final = 1.0 * dense_cosine + 0.6 * bm25_max_normalized, top-k
on TPU — dense+fusion via the candidate-union device kernel, BM25 via the
sorted-posting cumsum path. Two scale points in ONE JSON line:

  * 200k docs — with the exact-f32 CPU baseline (numpy brute force, the
    FAISS-Flat-CPU stand-in; FAISS is not installed) and recall@10 over
    the full batch;
  * 1M docs  — device-resident corpus (generated on-chip: >1GB host
    device_puts crawl through the tunnel), recall@10 vs an f32
    HIGHEST-precision device oracle on a 64-query subset (a full CPU
    oracle at 1M x 1024 would take minutes for no extra signal).

Prints ONE JSON line:
  {"metric": "...", "value": QPS, "unit": "queries/s", "vs_baseline": x,
   ..., "scale_1m": {...}}
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_doc_terms(n_docs: int, vocab: int, doc_len: int, rng) -> np.ndarray:
    """Zipf-ish term matrix (N, L) — one vectorized draw, not a per-doc loop."""
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    return rng.choice(vocab, size=(n_docs, doc_len), p=p).astype(np.int32)


def make_query_terms(b: int, vocab: int, q_len: int, rng, min_rank: int = 100):
    """Query terms sample the content-word band (rank >= min_rank): real
    queries are dominated by content words, not the stopword head of the
    Zipf curve (whose postings would be ~the whole corpus)."""
    ranks = np.arange(min_rank, vocab)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()
    return [rng.choice(ranks, size=q_len, p=p).tolist() for _ in range(b)]


def bench_hybrid(n_docs: int, b: int = 512, dim: int = 1024, vocab: int = 30_000,
                 doc_len: int = 40, q_len: int = 8, k: int = 100,
                 topk_eval: int = 10, rounds: int = 10,
                 cpu_baseline: bool = True, oracle_queries: int = 0,
                 seed: int = 0) -> dict:
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.bm25 import build_postings, gather_plan, gather_plan_sorted
    from anorag_tpu.ops.topk import hybrid_topk

    on_tpu = jax.default_backend() == "tpu"
    rng = np.random.default_rng(seed)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # corpus embeddings: generated on-device (unit rows); host copy only
    # when the CPU baseline needs it
    key = jax.random.PRNGKey(seed)
    emb_dev = jax.random.normal(key, (n_docs, dim), jnp.float32)
    emb_dev = emb_dev / jnp.linalg.norm(emb_dev, axis=1, keepdims=True)
    emb_host = np.asarray(emb_dev) if cpu_baseline else None
    emb_dev = emb_dev.astype(dtype)

    doc_terms = make_doc_terms(n_docs, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_terms = make_query_terms(b, vocab, q_len, rng)

    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    dr_dev = jax.device_put(jnp.asarray(doc_rows))
    wr_dev = jax.device_put(jnp.asarray(weight_rows))
    q_dev = jax.device_put(jnp.asarray(q, dtype))

    def hybrid_dev():
        return hybrid_topk(emb_dev, q_dev, dr_dev, wr_dev, k, n_docs=n_docs,
                           dense_k=128, sparse_m=64, sparse_weight=0.6,
                           recall_target=0.95)

    # warm up / compile. NOTE: timing forces a value read — on tunneled
    # devices block_until_ready can return before the work drains. Device
    # timing is best-of-3 round blocks: the tunnel's round-trip latency
    # varies 2x run-to-run and would otherwise understate the chip.
    v, i = hybrid_dev()
    _ = float(np.asarray(v[0, 0]))
    best_dt_dev = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(rounds):
            v, i = hybrid_dev()
        _ = float(np.asarray(v[0, 0]))
        best_dt_dev = min(best_dt_dev, time.perf_counter() - t0)
    qps = b * rounds / best_dt_dev
    our_idx = np.asarray(i)[:, :topk_eval]

    def sparse_cpu(rows_plan, nq):
        s = np.zeros((nq, n_docs), np.float32)
        for bi in range(nq):
            rows = rows_plan[bi]
            rows = rows[rows >= 0]
            s[bi] = np.bincount(postings.doc_ids[rows],
                                weights=postings.weights[rows],
                                minlength=n_docs).astype(np.float32)
        mx = s.max(axis=1, keepdims=True)
        return np.where(mx > 0, s / np.maximum(mx, 1e-30), 0.0)

    gi, _ = gather_plan(postings, q_terms)

    out = {
        "n_docs": n_docs, "batch": b,
        "qps": round(qps, 1),
        "latency_ms_per_batch": round(1000.0 * b / qps, 2),
    }

    if cpu_baseline:
        sparse_norm = sparse_cpu(gi, b)

        def hybrid_cpu():
            scores = q @ emb_host.T + 0.6 * sparse_norm
            part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
            ps = np.take_along_axis(scores, part, axis=1)
            order = np.argsort(-ps, axis=1)
            return np.take_along_axis(ps, order, 1), np.take_along_axis(part, order, 1)

        hybrid_cpu()  # warm caches
        best_dt = float("inf")
        for _ in range(3):  # best-of-3: shields the baseline from host contention
            t0 = time.perf_counter()
            cpu_vals, cpu_idx = hybrid_cpu()
            best_dt = min(best_dt, time.perf_counter() - t0)
        out["cpu_baseline_qps"] = round(b / best_dt, 1)
        out["vs_baseline"] = round(qps * best_dt / b, 2)
        exact_idx = cpu_idx[:, :topk_eval]
        out["recall_at_10_vs_exact_f32"] = round(float(np.mean([
            len(set(our_idx[j]) & set(exact_idx[j])) / topk_eval for j in range(b)
        ])), 4)
    elif oracle_queries:
        # device f32 oracle (HIGHEST precision: TPU f32 matmuls default to
        # bf16 passes) on a query subset
        nq = min(oracle_queries, b)
        sparse_sub = sparse_cpu(gi[:nq], nq)
        qo = jnp.asarray(q[:nq])
        so = jax.device_put(jnp.asarray(sparse_sub))
        scores = jnp.dot(qo, emb_dev.astype(jnp.float32).T,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32) + 0.6 * so
        _, oracle_i = jax.lax.top_k(scores, topk_eval)
        oracle_i = np.asarray(oracle_i)
        out["recall_at_10_vs_exact_f32"] = round(float(np.mean([
            len(set(our_idx[j]) & set(oracle_i[j])) / topk_eval for j in range(nq)
        ])), 4)
        out["recall_oracle_queries"] = nq
    return out


def main() -> int:
    import jax

    headline = bench_hybrid(200_000, cpu_baseline=True)
    scale_1m = bench_hybrid(1_000_000, cpu_baseline=False, oracle_queries=64,
                            rounds=5, seed=1)

    out = {
        "metric": "hybrid_query_qps_per_chip",
        "search_method": "candidate-union: approx_max_k dense + sorted-cumsum bm25 (rt 0.95)",
        "value": headline["qps"],
        "unit": "queries/s",
        "vs_baseline": headline["vs_baseline"],
        "recall_at_10_vs_exact_f32": headline["recall_at_10_vs_exact_f32"],
        "corpus": {"n_docs": headline["n_docs"], "dim": 1024,
                   "dtype": "bfloat16" if jax.default_backend() == "tpu" else "float32"},
        "batch": headline["batch"],
        "latency_ms_per_batch": headline["latency_ms_per_batch"],
        "cpu_baseline_qps": headline["cpu_baseline_qps"],
        "scale_1m": scale_1m,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
