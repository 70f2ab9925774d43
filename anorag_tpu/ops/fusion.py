"""Score fusion as vectorized array transforms.

Device-friendly re-design of HybridSearcher.fuse
(/root/reference/retrieval/hybrid_search.py:34-103) and the
`_enhanced_hybrid_search_v2` fusion math
(/root/reference/query/query_processor.py:1089-1133): instead of per-note
dict juggling, all sources are aligned into a (S, C) score matrix over a
union candidate table (padded, masked), and fusion is a handful of
elementwise ops + reductions that XLA fuses into one pass.

Semantics preserved:
  * linear: per-source max-normalization (path scores NOT normalized),
    weighted sum;
  * rrf:  sum_s w_s / (k + rank_s) over dense/bm25/graph; path added
    additively with weight w_path * raw score;
  * enhanced v2: final = 1.0*dense + 0.6*sparse, multiplied by section /
    lexical penalties, zeroed below the noise threshold unless must-have
    terms are satisfied, then multiplied by entity/predicate boosts.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

SOURCE_ORDER = ("dense", "bm25", "graph", "path")


def max_normalize(scores: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """Per-row max-normalization over present entries (missing -> 0)."""
    s = jnp.where(present, scores, 0.0)
    mx = jnp.max(s, axis=-1, keepdims=True)
    return jnp.where(present & (mx > 0), s / jnp.maximum(mx, 1e-30), 0.0)


def linear_fuse(
    scores: jnp.ndarray,     # (S, C) rows in SOURCE_ORDER
    present: jnp.ndarray,    # (S, C) bool
    weights: jnp.ndarray,    # (S,)
) -> jnp.ndarray:
    """Weighted sum of max-normalized sources; path row stays raw."""
    normed = max_normalize(scores, present)
    path_row = len(SOURCE_ORDER) - 1
    normed = normed.at[path_row].set(jnp.where(present[path_row], scores[path_row], 0.0))
    return jnp.sum(weights[:, None] * normed, axis=0)


def ranks_desc(scores: jnp.ndarray, present: jnp.ndarray) -> jnp.ndarray:
    """1-based rank among present entries, descending score.

    Ties get distinct consecutive ranks (argsort order), matching the
    stable-sorted enumerate in the reference.
    """
    masked = jnp.where(present, scores, -jnp.inf)
    order = jnp.argsort(-masked, axis=-1, stable=True)
    pos = jnp.argsort(order, axis=-1, stable=True)  # inverse permutation
    return pos + 1


def rrf_fuse(
    scores: jnp.ndarray,
    present: jnp.ndarray,
    weights: jnp.ndarray,
    rrf_k: float = 60.0,
) -> jnp.ndarray:
    path_row = len(SOURCE_ORDER) - 1
    contrib = []
    for s in range(path_row):
        r = ranks_desc(scores[s], present[s])
        contrib.append(jnp.where(present[s], weights[s] / (rrf_k + r), 0.0))
    fused = jnp.sum(jnp.stack(contrib), axis=0)
    fused = fused + weights[path_row] * jnp.where(present[path_row], scores[path_row], 0.0)
    return fused


def enhanced_v2(
    dense: jnp.ndarray,               # (C,)
    sparse: jnp.ndarray,              # (C,)
    *,
    dense_weight: float = 1.0,
    sparse_weight: float = 0.6,
    section_penalty: Optional[jnp.ndarray] = None,   # (C,) multiplicative
    lexical_penalty: Optional[jnp.ndarray] = None,   # (C,) multiplicative
    noise_threshold: float = 0.2,
    satisfies_must_have: Optional[jnp.ndarray] = None,  # (C,) bool
    entity_boost: Optional[jnp.ndarray] = None,      # (C,) multiplicative
    predicate_boost: Optional[jnp.ndarray] = None,   # (C,) multiplicative
) -> jnp.ndarray:
    """final_base for every candidate; filtered candidates come out as 0."""
    final = dense_weight * dense + sparse_weight * sparse
    if section_penalty is not None:
        final = final * section_penalty
    if lexical_penalty is not None:
        final = final * lexical_penalty
    ok = satisfies_must_have if satisfies_must_have is not None else jnp.zeros_like(final, bool)
    final = jnp.where((final < noise_threshold) & ~ok, 0.0, final)
    if entity_boost is not None:
        final = final * entity_boost
    if predicate_boost is not None:
        final = final * predicate_boost
    return final


def fuse_candidate_table(
    source_scores: Dict[str, Dict[str, float]],
    method: str = "linear",
    weights: Optional[Dict[str, float]] = None,
    rrf_k: float = 60.0,
    candidate_pool: int = 50,
):
    """Host wrapper with the HybridSearcher.fuse contract: dict-of-dicts in,
    ranked [{note_id, scores, final_similarity, tags}] out."""
    weights = weights or {}
    all_ids: Dict[str, None] = {}
    for src in SOURCE_ORDER:
        for nid in source_scores.get(src, {}):
            all_ids.setdefault(nid)
    ids = list(all_ids)
    if not ids:
        return []
    c = len(ids)
    scores = np.zeros((len(SOURCE_ORDER), c), np.float32)
    present = np.zeros((len(SOURCE_ORDER), c), bool)
    for s, src in enumerate(SOURCE_ORDER):
        d = source_scores.get(src, {})
        for j, nid in enumerate(ids):
            if nid in d:
                scores[s, j] = d[nid]
                present[s, j] = True
    w = np.array([weights.get(src, 0.0) for src in SOURCE_ORDER], np.float32)
    if method == "rrf":
        fused = np.asarray(rrf_fuse(jnp.asarray(scores), jnp.asarray(present), jnp.asarray(w), rrf_k))
        # RRF only ranks ids present in dense/bm25/graph
        core_present = present[:3].any(axis=0)
    else:
        fused = np.asarray(linear_fuse(jnp.asarray(scores), jnp.asarray(present), jnp.asarray(w)))
        core_present = present.any(axis=0)

    results = []
    for j, nid in enumerate(ids):
        if not core_present[j]:
            continue
        results.append(
            {
                "note_id": nid,
                "scores": {
                    src: (float(scores[s, j]) if present[s, j] else None)
                    for s, src in enumerate(SOURCE_ORDER)
                },
                "final_similarity": float(fused[j]),
                "tags": {
                    "source": "graph" if present[2, j] else "semantic",
                    "is_bridge": bool(present[3, j]),
                },
            }
        )
    results.sort(key=lambda r: r["final_similarity"], reverse=True)
    return results[:candidate_pool]
