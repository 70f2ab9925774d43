#!/usr/bin/env python
"""Benchmark: hybrid-query (dense + BM25, v2 fusion) QPS per chip.

The headline workload from BASELINE.md: over an atomic-notes corpus
(N x 1024, MuSiQue-scale vocabulary), answer query batches with
  final = 1.0 * dense_cosine + 0.6 * bm25_max_normalized, top-k
on TPU — BM25 via the device postings gather/segment-sum, dense+fusion via
the fused Pallas matmul+top-k kernel with the sparse bias folded into the
corpus scan. The baseline is the same exact math on CPU (numpy brute-force
matmul + argpartition — the FAISS-Flat-CPU stand-in; FAISS itself is not
installed in this image).

Prints ONE JSON line:
  {"metric": "...", "value": QPS, "unit": "queries/s", "vs_baseline": x,
   ...extras (recall@10 vs exact-f32, corpus size, latency)}
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_corpus(n_docs: int, dim: int, vocab: int, doc_len: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n_docs, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    # Zipf-ish term distribution like real text
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    doc_terms = [rng.choice(vocab, size=doc_len, p=p).tolist() for _ in range(n_docs)]
    return emb, doc_terms


def make_queries(b: int, dim: int, vocab: int, q_len: int, seed: int = 1,
                 min_rank: int = 100):
    """Query terms sample the content-word band (rank >= min_rank): real
    queries are dominated by content words, not the stopword head of the
    Zipf curve (whose postings would be ~the whole corpus)."""
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    ranks = np.arange(min_rank, vocab)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()
    q_terms = [rng.choice(ranks, size=q_len, p=p).tolist() for _ in range(b)]
    return q, q_terms


def main() -> int:
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.bm25 import build_postings, gather_plan, gather_plan_sorted
    from anorag_tpu.ops.topk import hybrid_topk

    N, D, VOCAB, DOC_LEN = 200_000, 1024, 30_000, 40
    B, QLEN, K, TOPK_EVAL = 512, 8, 100, 10
    BLOCK_ROWS = 2048
    ROUNDS = 10

    emb, doc_terms = make_corpus(N, D, VOCAB, DOC_LEN)
    q, q_terms = make_queries(B, D, VOCAB, QLEN)
    postings = build_postings(doc_terms, VOCAB)

    on_tpu = jax.default_backend() == "tpu"

    # ---- device setup ---------------------------------------------------
    emb_dev = jax.device_put(jnp.asarray(emb, jnp.bfloat16 if on_tpu else jnp.float32))
    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    dr_dev = jax.device_put(jnp.asarray(doc_rows))
    wr_dev = jax.device_put(jnp.asarray(weight_rows))
    gi, _ = gather_plan(postings, q_terms)   # (scatter plan kept for the CPU baseline)

    q_dev = jax.device_put(jnp.asarray(q, emb_dev.dtype))

    def hybrid_tpu():
        # candidate-union fusion: dense approx top-k  u  sorted-cumsum BM25
        # top-m, cross-scored and fused — fully scatter-free
        return hybrid_topk(emb_dev, q_dev, dr_dev, wr_dev, K, n_docs=N,
                           dense_k=128, sparse_m=64, sparse_weight=0.6,
                           recall_target=0.95)

    # warm up / compile. NOTE: timing forces a value read — on tunneled
    # devices block_until_ready can return before the work drains.
    v, i = hybrid_tpu()
    _ = float(np.asarray(v[0, 0]))
    t0 = time.perf_counter()
    for _ in range(ROUNDS):
        v, i = hybrid_tpu()
    _ = float(np.asarray(v[0, 0]))
    tpu_qps = B * ROUNDS / (time.perf_counter() - t0)
    tpu_lat_ms = 1000.0 * B / tpu_qps
    our_idx = np.asarray(i)[:, :TOPK_EVAL]

    # ---- CPU exact baseline (numpy, f32) --------------------------------
    def sparse_cpu():
        s = np.zeros((B, N), np.float32)
        for bi in range(B):
            rows = gi[bi]
            rows = rows[rows >= 0]
            s[bi] = np.bincount(postings.doc_ids[rows],
                                weights=postings.weights[rows],
                                minlength=N).astype(np.float32)
        mx = s.max(axis=1, keepdims=True)
        return np.where(mx > 0, s / np.maximum(mx, 1e-30), 0.0)

    def hybrid_cpu():
        scores = q @ emb.T + 0.6 * sparse_norm
        part = np.argpartition(-scores, K - 1, axis=1)[:, :K]
        ps = np.take_along_axis(scores, part, axis=1)
        order = np.argsort(-ps, axis=1)
        return np.take_along_axis(ps, order, 1), np.take_along_axis(part, order, 1)

    sparse_norm = sparse_cpu()
    hybrid_cpu()  # warm caches
    best_dt = float("inf")
    for _ in range(3):   # best-of-3: shields the baseline from host contention
        t0 = time.perf_counter()
        cpu_vals, cpu_idx = hybrid_cpu()
        best_dt = min(best_dt, time.perf_counter() - t0)
    cpu_qps = B / best_dt

    # ---- recall@10 parity vs exact f32 hybrid ----------------------------
    exact_idx = cpu_idx[:, :TOPK_EVAL]
    recall = float(np.mean([
        len(set(our_idx[b]) & set(exact_idx[b])) / TOPK_EVAL for b in range(B)
    ]))

    out = {
        "metric": "hybrid_query_qps_per_chip",
        "search_method": "candidate-union: approx_max_k dense + sorted-cumsum bm25 (rt 0.95)",
        "value": round(tpu_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(tpu_qps / cpu_qps, 2),
        "recall_at_10_vs_exact_f32": round(recall, 4),
        "corpus": {"n_docs": N, "dim": D, "dtype": "bfloat16" if on_tpu else "float32"},
        "batch": B,
        "latency_ms_per_batch": round(tpu_lat_ms, 2),
        "cpu_baseline_qps": round(cpu_qps, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
