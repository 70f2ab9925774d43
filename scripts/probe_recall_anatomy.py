"""Decompose the hybrid recall@10 loss (BENCH r4: 0.9828 < 0.985 gate).

CPU-only simulation at reduced scale: isolates (1) bf16 embedding rounding,
(2) candidate-union geometry (dense_k/sparse_m misses), (3) f32 rescoring of
the candidate union. approx_max_k misses can't be simulated on CPU (exact
fallback) — measured separately on-chip.

Usage: python scripts/probe_recall_anatomy.py [--n 50000] [--b 256]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def ml_dtype_round(x: np.ndarray) -> np.ndarray:
    import ml_dtypes
    return x.astype(ml_dtypes.bfloat16).astype(np.float32)


def recall(ours: np.ndarray, oracle: np.ndarray, k: int = 10) -> float:
    return float(np.mean([
        len(set(ours[j, :k]) & set(oracle[j, :k])) / k
        for j in range(len(ours))]))


def topk_np(scores: np.ndarray, k: int):
    part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
    ps = np.take_along_axis(scores, part, axis=1)
    order = np.argsort(-ps, axis=1)
    return (np.take_along_axis(ps, order, axis=1),
            np.take_along_axis(part, order, axis=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--dense-k", type=int, default=128)
    ap.add_argument("--sparse-m", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from bench import make_doc_terms, make_query_terms  # noqa: E402
    from anorag_tpu.ops.bm25 import build_postings, gather_plan

    rng = np.random.default_rng(args.seed)
    n, b, dim = args.n, args.b, args.dim
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    doc_terms = make_doc_terms(n, 30_000, 64, rng)
    postings = build_postings([r.tolist() for r in doc_terms], 30_000)
    q_terms = make_query_terms(b, 30_000, 8, rng)
    gi, _ = gather_plan(postings, q_terms)
    sparse = np.zeros((b, n), np.float32)
    for bi in range(b):
        rows = gi[bi][gi[bi] >= 0]
        sparse[bi] = np.bincount(postings.doc_ids[rows],
                                 weights=postings.weights[rows],
                                 minlength=n).astype(np.float32)
    mx = sparse.max(axis=1, keepdims=True)
    sparse_n = np.where(mx > 0, sparse / np.maximum(mx, 1e-30), 0.0)

    dense_f32 = q @ emb.T
    fused_f32 = dense_f32 + 0.6 * sparse_n
    _, oracle = topk_np(fused_f32, 10)

    emb_bf = ml_dtype_round(emb)
    q_bf = ml_dtype_round(q)
    dense_bf = q_bf @ emb_bf.T          # f32 accumulate over bf16 inputs

    # --- ladder ---
    # 1. full fused scan, bf16 inputs (no candidate union): isolates rounding
    _, idx1 = topk_np(dense_bf + 0.6 * sparse_n, 10)
    r1 = recall(idx1, oracle)

    # 2. candidate-union (exact selects, bf16 scores) = current prod path
    #    minus approx_max_k
    def union_path(dense_scores, rescore_f32=False, dense_k=args.dense_k):
        _, d_idx = topk_np(dense_scores, dense_k)
        _, s_idx = topk_np(sparse_n, args.sparse_m)
        out = np.full((b, 10), -1, np.int64)
        for bi in range(b):
            cand = np.unique(np.concatenate([d_idx[bi], s_idx[bi]]))
            base = dense_f32[bi] if rescore_f32 else dense_scores[bi]
            f = base[cand] + 0.6 * sparse_n[bi][cand]
            out[bi] = cand[np.argsort(-f)[:10]]
        return out

    r2 = recall(union_path(dense_bf), oracle)
    # 3. union + f32 rescore of candidates (needs f32 emb copy on device)
    r3 = recall(union_path(dense_bf, rescore_f32=True), oracle)
    # 4. union geometry alone (f32 everywhere)
    r4 = recall(union_path(dense_f32), oracle)
    # 5. wider dense_k, bf16, no rescore
    r5 = recall(union_path(dense_bf, dense_k=256), oracle)
    # 6. wider dense_k + f32 rescore
    r6 = recall(union_path(dense_bf, rescore_f32=True, dense_k=256), oracle)

    print(f"n={n} b={b} dim={dim} dense_k={args.dense_k} m={args.sparse_m}")
    print(f"1 full-scan bf16 inputs          recall@10 = {r1:.4f}  (rounding only)")
    print(f"2 union bf16 (prod minus approx) recall@10 = {r2:.4f}")
    print(f"3 union bf16 cand + f32 rescore  recall@10 = {r3:.4f}")
    print(f"4 union f32 (geometry only)      recall@10 = {r4:.4f}")
    print(f"5 union bf16, dense_k=256        recall@10 = {r5:.4f}")
    print(f"6 union bf16 k256 + f32 rescore  recall@10 = {r6:.4f}")


if __name__ == "__main__":
    main()


def truncated_table_variant(args=None):
    """Variant 7+: replicate hybrid_fuse's sparse-score truncation — a
    dense candidate outside the sparse top-m table scores 0 on the sparse
    side (ops/topk.py hybrid_fuse). Run: python -c "import sys;
    sys.argv=['x','--n','200000','--b','128'];
    from scripts.probe_recall_anatomy import truncated_table_variant as t;
    t()" (or via main below)."""
