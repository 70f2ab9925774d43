#!/usr/bin/env python
"""Dense-kernel breakdown on the real chip: where do the milliseconds go?

Times each stage of the hybrid headline workload (200k x 1024, B=512)
separately — matmul alone, matmul+approx_max_k (the shipped path), the
bucketed-winners pallas kernel, its XLA-scan oracle, the chunked approx
scan, the sparse stage, and full hybrid — with the tunnel timing rules
(forced value read, best-of-3 round blocks).

Usage: python scripts/bench_kernel_breakdown.py [n_docs] [batch]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def timeit(fn, rounds=20, blocks=3):
    out = fn()
    _force(out)
    best = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = fn()
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best / rounds


def _force(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    # single-element device slice THEN transfer: np.asarray(leaf) would pull
    # the whole array through the tunnel and time the transfer, not the op
    flat = leaf.reshape(-1)[:1]
    _ = float(np.asarray(flat)[0])


def main():
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.bm25 import (build_postings, gather_plan_sorted,
                                     sparse_topm_from_sorted)
    from anorag_tpu.ops.topk import (bucket_topk, dense_topk_xla, hybrid_fuse,
                                     hybrid_topk)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d = 1024
    k = 100
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_dev = jax.device_put(jnp.asarray(q, dtype))

    flops = 2.0 * b * n * d
    peak = 197e12 if on_tpu else 1e12

    def report(name, dt):
        tf = flops / dt / 1e12
        print(f"{name:34s} {dt*1e3:8.2f} ms  {tf:7.1f} TF/s  MFU {100*tf*1e12/peak:5.1f}%")

    # 0. dispatch floor: a trivial op through the same harness — everything
    # below carries this additive per-call overhead (tunnel dispatch)
    tiny = jax.jit(lambda x: x + 1.0)
    tiny_in = jnp.zeros((8, 128))
    dt = timeit(lambda: tiny(tiny_in), rounds=50)
    print(f"{'dispatch floor (tiny op)':34s} {dt*1e3:8.2f} ms")

    # 1. matmul only (force full materialization via value read)
    mm = jax.jit(lambda e, qq: jnp.dot(qq, e.T, preferred_element_type=jnp.float32))
    report("matmul (B,N) f32", timeit(lambda: mm(emb, q_dev)))

    # 2. matmul + approx_max_k (shipped two-pass)
    @jax.jit
    def twopass(e, qq):
        s = jnp.dot(qq, e.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, 128, recall_target=0.95)
    report("matmul+approx_max_k(128)", timeit(lambda: twopass(emb, q_dev)))

    # 3. bucketed-winners pallas (transposed layout measured worse: 5.9 vs
    # 4.8 ms — Mosaic relayouts the (D,W) block for the MXU anyway)
    for w, tiles in ((512, 1), (512, 2), (512, 4)):
        report(f"bucket pallas w={w} t={tiles}",
               timeit(lambda w=w, t=tiles: bucket_topk(emb, q_dev, k, w=w, tiles=t)))

    # 4. bucket XLA-scan oracle
    report("bucket_topk xla-scan w=1024",
           timeit(lambda: bucket_topk(emb, q_dev, k, w=1024, use_xla=True)))

    # 5. chunked approx scan
    report("approx_scan chunk=64k",
           timeit(lambda: dense_topk_xla(emb, q_dev, k, approx=on_tpu)))

    # 6. sparse stage + full hybrid
    vocab, doc_len, q_len = 30_000, 40, 8
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    doc_terms = rng.choice(vocab, size=(n, doc_len), p=p).astype(np.int32)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    ranks = np.arange(100, vocab)
    pq = 1.0 / (ranks + 1.0)
    pq /= pq.sum()
    q_terms = [rng.choice(ranks, size=q_len, p=pq).tolist() for _ in range(b)]
    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    dr = jax.device_put(jnp.asarray(doc_rows))
    wr = jax.device_put(jnp.asarray(weight_rows))

    def sparse_only():
        return sparse_topm_from_sorted(dr, wr, 64, n)
    dt = timeit(sparse_only)
    print(f"{'sparse top-m (bm25)':34s} {dt*1e3:8.2f} ms  L={doc_rows.shape[1]}")

    from anorag_tpu.ops.bm25 import sparse_topm_winners

    def sparse_winners():
        return sparse_topm_winners(dr, wr, 64, n)
    dt = timeit(sparse_winners)
    print(f"{'sparse top-m (winners kernel)':34s} {dt*1e3:8.2f} ms")

    def sparse_window():
        return sparse_topm_winners(dr, wr, 64, n, max_seg=q_len)
    dt = timeit(sparse_window)
    print(f"{'sparse top-m (window kernel)':34s} {dt*1e3:8.2f} ms")

    def hyb_window():
        return hybrid_topk(emb, q_dev, dr, wr, k, n_docs=n, dense_k=128,
                           sparse_m=64, sparse_weight=0.6, recall_target=0.95,
                           max_seg=q_len)
    report("hybrid_topk (window sparse)", timeit(hyb_window))

    def hyb():
        return hybrid_topk(emb, q_dev, dr, wr, k, n_docs=n, dense_k=128,
                           sparse_m=64, sparse_weight=0.6, recall_target=0.95)
    report("hybrid_topk (shipped)", timeit(hyb))

    # recall check for the bucket path (device f32 oracle on a subset)
    nq = min(64, b)
    bv, bi = bucket_topk(emb, q_dev, k, w=512, tiles=2)
    scores = jnp.dot(jnp.asarray(q[:nq]), emb.astype(jnp.float32).T,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    _, oi = jax.lax.top_k(scores, 10)
    oi = np.asarray(oi)
    bi = np.asarray(bi)[:nq, :10]
    rec = np.mean([len(set(bi[j]) & set(oi[j])) / 10 for j in range(nq)])
    print(f"bucket dense recall@10 vs exact f32: {rec:.4f}")


if __name__ == "__main__":
    main()
