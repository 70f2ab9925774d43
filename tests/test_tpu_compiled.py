"""Opt-in real-chip parity suite (`ANORAG_TPU_TESTS=1 pytest -m tpu`).

The default CI suite forces CPU, so the Pallas streaming top-k only ever
runs in interpret mode there; these tests compile the Mosaic kernel and
the int8 scan paths on the attached TPU and check them against oracles
computed at matched precision. They self-skip off-TPU (including in the
default CPU-forced CI job).

Shapes are kept small-but-tiled: each fresh jit costs 5-120s over the
tunneled chip (CLAUDE.md), so one shape per code path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

on_tpu = jax.default_backend() == "tpu"
needs_tpu = pytest.mark.skipif(not on_tpu, reason="no TPU attached")


def _mk(n, d, b, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q


@needs_tpu
def test_pallas_compiled_exact_topk():
    """Mosaic-compiled streaming kernel == device-matmul + lax.top_k.

    The oracle recomputes scores with the same dtype path the kernel uses
    (bf16 storage, f32 accumulation), so any mismatch is kernel merge
    logic — exactly the regression class interpret-mode CI can't see."""
    from anorag_tpu.ops.topk import dense_topk

    emb, q = _mk(20_000, 256, 16)
    emb_dev = jnp.asarray(emb, jnp.bfloat16)
    q_dev = jnp.asarray(q, jnp.bfloat16)
    vals, idx = dense_topk(emb_dev, q_dev, 32, use_pallas=True, interpret=False)
    _ = float(np.asarray(vals)[0, 0])  # force drain through the tunnel
    scores = jnp.dot(q_dev, emb_dev.T, preferred_element_type=jnp.float32)
    ov, oi = jax.lax.top_k(scores, 32)
    ov = np.asarray(ov)
    vals = np.asarray(vals)
    np.testing.assert_allclose(np.sort(vals, 1), np.sort(ov, 1), atol=1e-3)
    # indices agree modulo exact score ties
    same = np.asarray(idx) == np.asarray(oi)
    tied = np.isclose(vals, ov, atol=1e-6)
    assert np.all(same | tied)


@needs_tpu
def test_approx_max_k_recall_on_chip():
    from anorag_tpu.ops.topk import dense_topk, dense_topk_np

    emb, q = _mk(50_000, 256, 32, seed=1)
    vals, idx = dense_topk(jnp.asarray(emb, jnp.bfloat16),
                           jnp.asarray(q, jnp.bfloat16), 10,
                           method="approx", recall_target=0.95)
    _ = float(np.asarray(vals)[0, 0])
    _, exact = dense_topk_np(emb, q, 10)
    got = np.asarray(idx)
    rec = np.mean([len(set(got[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert rec >= 0.9


@needs_tpu
def test_int8_sketch_scan_on_chip():
    """Compiled int8 MXU scan (ops/sq.py) == host int32 recompute."""
    from anorag_tpu.ops.sq import encode_sq, sq_quantize_queries, sq_topk, train_sq

    emb, q = _mk(30_000, 256, 8, seed=2)
    rot = train_sq(emb, r=64)
    codes, scales = encode_sq(emb, rot)
    qc, qs = sq_quantize_queries(q, rot)
    vals, idx = sq_topk(jnp.asarray(codes), jnp.asarray(scales), qc, qs, 16,
                        approx=False)
    vals, idx = np.asarray(vals), np.asarray(idx)
    _ = float(vals[0, 0])
    host = (np.asarray(qc, np.int32) @ codes.astype(np.int32).T).astype(np.float32)
    host *= scales[None, :] * np.asarray(qs)[:, None]
    oi = np.argsort(-host, axis=1)[:, :16]
    ov = np.take_along_axis(host, oi, axis=1)
    np.testing.assert_allclose(np.sort(vals, 1), np.sort(ov, 1), rtol=1e-5, atol=1e-5)


@needs_tpu
def test_lsh_sign_scan_on_chip():
    """Compiled ±1 int8 Hamming scan + device refine == host oracles."""
    from anorag_tpu.ops.lsh import encode_lsh, lsh_search, train_lsh
    from anorag_tpu.ops.topk import dense_topk_np

    # clustered corpus + perturbed-row queries: iid-random data is LSH's
    # worst case (all sims ~0 -> the top-10 are Hamming near-ties; recall
    # 0.44-0.57 measured there) and not the retrieval-shaped workload the
    # index exists for — matches tests/test_lsh_hnsw.py's generator
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((512, 256)).astype(np.float32) * 2.0
    emb = centers[rng.integers(0, 512, 20_000)] \
        + 0.3 * rng.standard_normal((20_000, 256)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = emb[rng.integers(0, len(emb), 16)] \
        + 0.05 * rng.standard_normal((16, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    planes = jnp.asarray(train_lsh(256, 256, seed=4))
    codes = jnp.asarray(encode_lsh(emb, np.asarray(planes)))
    # codes match host signs except where the projection is ~0: TPU f32
    # matmuls run bf16 passes, so near-zero magnitudes may flip sign
    sample = np.asarray(codes[:64])
    proj = emb[:64] @ np.asarray(planes)
    mismatch = sample != np.where(proj >= 0, 1, -1)
    assert np.all(np.abs(proj[mismatch]) < 1e-2), (
        f"{mismatch.sum()} sign flips at |proj| up to "
        f"{np.abs(proj[mismatch]).max() if mismatch.any() else 0}")
    emb_dev = jnp.asarray(emb)
    vals, idx = lsh_search(codes, planes, q, 10, emb_dev=emb_dev,
                           candidates=256)
    _, exact = dense_topk_np(emb, q, 10)
    rec = np.mean([len(set(idx[i]) & set(exact[i])) / 10 for i in range(len(q))])
    assert rec >= 0.85
    # refined values are true inner products of the returned ids
    want = np.einsum("bd,bd->b", q, emb[idx[:, 0]])
    np.testing.assert_allclose(vals[:, 0], want, rtol=1e-2, atol=1e-2)


@needs_tpu
def test_segment_scan_kernel_on_chip():
    """Mosaic-compiled fused segment scan == the unfused XLA chain."""
    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted
    from anorag_tpu.ops.topk import NEG_INF

    rng = np.random.default_rng(5)
    n_docs, b, l = 5000, 64, 4096
    rows = []
    for _ in range(b):
        n_valid = rng.integers(10, l)
        ids = np.sort(rng.integers(0, n_docs, n_valid))
        rows.append(np.concatenate([ids, np.full(l - n_valid, n_docs)]).astype(np.int32))
    a = jnp.asarray(np.stack(rows))
    w_host = rng.random((b, l)).astype(np.float32) + 0.01
    w = jnp.asarray(np.where(np.asarray(a) < n_docs, w_host, 0.0))
    m1, tv1, td1, mx1 = sparse_topm_from_sorted(a, w, 32, n_docs, impl="pallas")
    m2, tv2, td2, mx2 = sparse_topm_from_sorted(a, w, 32, n_docs, impl="xla")
    _ = float(np.asarray(tv1)[0, 0])
    m1, m2 = np.asarray(m1), np.asarray(m2)
    valid = m2 > NEG_INF / 2
    # totals are cumsum DIFFERENCES: at cumsum magnitude ~2e3 the f32 ulp
    # is ~1.2e-4, and the two impls reassociate differently — abs noise up
    # to ~2x ulp on small totals is inherent, not a kernel bug
    np.testing.assert_allclose(m1[valid], m2[valid], rtol=1e-3, atol=1e-3)
    assert np.all(m1[~valid] <= NEG_INF / 2)
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx2), rtol=1e-3)


@needs_tpu
def test_hybrid_topk_on_chip():
    """Compiled candidate-union hybrid == numpy fusion oracle recall."""
    from anorag_tpu.ops.bm25 import build_postings, gather_plan_sorted
    from anorag_tpu.ops.topk import hybrid_topk

    rng = np.random.default_rng(3)
    n, d, b, vocab = 20_000, 256, 16, 30_000
    emb, q = _mk(n, d, b, seed=3)
    # Zipf terms (the bench.py workload). Uniform terms create huge
    # sparse-score tie groups whose dense-driven winners fall outside
    # both candidate lists — a structural union-fusion gap, not a kernel
    # bug (measured: uniform 0.46, zipf 0.93 with the SAME kernel).
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    doc_terms = rng.choice(vocab, size=(n, 40), p=p).astype(np.int32)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    ranks = np.arange(100, vocab)
    pq = 1.0 / (ranks + 1.0)
    pq /= pq.sum()
    q_terms = [rng.choice(ranks, size=8, p=pq).tolist() for _ in range(b)]
    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    vals, idx = hybrid_topk(
        jnp.asarray(emb, jnp.bfloat16), jnp.asarray(q, jnp.bfloat16),
        jnp.asarray(doc_rows), jnp.asarray(weight_rows), 10, n_docs=n,
        dense_k=128, sparse_m=64, sparse_weight=0.6, recall_target=0.95)
    _ = float(np.asarray(vals)[0, 0])
    # numpy oracle: full fused scores. gather_plan_sorted returns doc ids
    # (N-padded) + weights directly, not posting-array indices.
    sparse = np.zeros((b, n), np.float32)
    for bi in range(b):
        valid = doc_rows[bi] < n
        np.add.at(sparse[bi], doc_rows[bi][valid], weight_rows[bi][valid])
    mx = sparse.max(axis=1, keepdims=True)
    sparse = np.where(mx > 0, sparse / np.maximum(mx, 1e-30), 0.0)
    fused = q @ emb.T + 0.6 * sparse
    exact = np.argsort(-fused, axis=1)[:, :10]
    got = np.asarray(idx)
    rec = np.mean([len(set(got[i]) & set(exact[i])) / 10 for i in range(b)])
    assert rec >= 0.85  # bf16 scores + approx_max_k both cost a little


@needs_tpu
def test_compiled_bucket_topk_matches_xla_oracle():
    """The Mosaic bucketed-winners dense kernel == its XLA-scan oracle,
    compiled on the real chip (bit-identical bucket semantics)."""
    from anorag_tpu.ops.topk import bucket_topk

    emb, q = _mk(3000, 256, 16, seed=5)
    embd, qd = jnp.asarray(emb), jnp.asarray(q)
    v1, i1 = bucket_topk(embd, qd, 10, w=512, interpret=False)
    v2, i2 = bucket_topk(embd, qd, 10, w=512, use_xla=True)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


@needs_tpu
def test_compiled_window_winners_matches_scan_kernel():
    """Compiled scan-free window kernel (tiled + untiled layouts) agrees
    with the scan winners kernel and the exact XLA chain on shared docs."""
    from anorag_tpu.ops.bm25 import (plan_tiles, sparse_topm_from_sorted,
                                     sparse_topm_winners)

    rng = np.random.default_rng(3)
    n_docs, b, l, max_seg = 4000, 16, 4096, 6
    rows = []
    for _ in range(b):
        nv = int(rng.integers(l // 2, l))
        ids = np.sort(rng.integers(0, n_docs, nv))
        v, c = np.unique(ids, return_counts=True)
        ids = np.repeat(v, np.minimum(c, max_seg))
        ids = np.concatenate([ids, np.full(max(l - len(ids), 0), n_docs)])
        rows.append(ids[:l].astype(np.int32))
    a = np.stack(rows)
    w = np.where(a < n_docs, rng.random((b, l)).astype(np.float32) + 0.01, 0.0)
    ad, wd = jnp.asarray(a), jnp.asarray(w)
    _, tv0, td0, mx0 = sparse_topm_from_sorted(ad, wd, 16, n_docs, impl="xla")
    tv1, td1, mx1 = sparse_topm_winners(ad, wd, 16, n_docs, max_seg=max_seg)
    a3, w3 = plan_tiles(a, w, n_docs)
    tv2, td2, mx2 = sparse_topm_winners(jnp.asarray(a3), jnp.asarray(w3), 16,
                                        n_docs, max_seg=max_seg, b_valid=b)
    np.testing.assert_allclose(np.asarray(mx1), np.asarray(mx0), rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(td2), np.asarray(td1))
    np.testing.assert_allclose(np.asarray(tv2), np.asarray(tv1), rtol=1e-5)
    tv0, td0, tv1, td1 = map(np.asarray, (tv0, td0, tv1, td1))
    for bi in range(b):
        gold = {d: v for d, v in zip(td0[bi], tv0[bi]) if d >= 0}
        got = {d: v for d, v in zip(td1[bi], tv1[bi]) if d >= 0}
        shared = set(gold) & set(got)
        assert len(shared) >= 0.8 * len(gold)
        for d in shared:
            np.testing.assert_allclose(got[d], gold[d], rtol=1e-4)
