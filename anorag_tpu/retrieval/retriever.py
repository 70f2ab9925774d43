"""VectorRetriever: the dense-retrieval facade over notes.

Parity target: /root/reference/vector_store/retriever.py — build index from
notes (embed -> index -> add) with a lexical fallback index (:924-956),
batched `search` with threshold filtering and `retrieval_info` tagging
(:186-272), the enhanced 4-stage `retrieve` (over-fetch x3, filter_fn,
must-have-terms penalty x0.6 / entity boost x1.2 / predicate boost x1.15,
threshold+sort, :339-512), incremental add/remove/update with rebuilds
(:514-629), persistence (atomic_notes.json + note_embeddings.npz +
id_mappings.json, :724-749), and namespace-fallback search (:1004-1035).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

from anorag_tpu.index.bm25_index import BM25Index
from anorag_tpu.index.vector_index import VectorIndex
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.utils.file_io import read_json, write_json
from anorag_tpu.utils.logging import get_logger, log_performance

logger = get_logger("anorag.retrieval")

MISS_PENALTY = 0.6
ENTITY_BOOST = 1.2
PREDICATE_BOOST = 1.15
OVERFETCH = 3


class VectorRetriever:
    def __init__(
        self,
        embedding_manager: Optional[EmbeddingManager] = None,
        dimension: int = 1024,
        index_type: str = "IVFFlat",
        similarity_threshold: float = 0.5,
        top_k: int = 20,
        nlist: int = 20,
        nprobe: int = 4,
        use_pallas: Optional[bool] = None,
        recall_target: float = 0.95,
        mesh=None,
        index_params: Optional[Dict[str, Any]] = None,
    ):
        self.em = embedding_manager or EmbeddingManager(singleton=False)
        self.dimension = self.em.dim or dimension
        self.index_type = index_type
        self.similarity_threshold = similarity_threshold
        self.top_k = top_k
        self.mesh = mesh
        self._index_kw = dict(nlist=nlist, nprobe=nprobe, use_pallas=use_pallas,
                              recall_target=recall_target, mesh=mesh,
                              **(index_params or {}))
        self.notes: List[Dict[str, Any]] = []
        self.embeddings: Optional[np.ndarray] = None
        self.index: Optional[VectorIndex] = None
        self._lexical: Optional[BM25Index] = None   # fallback sparse index

    # ------------------------------------------------------------- build
    @log_performance
    def build_index(self, notes: Sequence[Dict[str, Any]],
                    embeddings: Optional[np.ndarray] = None) -> None:
        self.notes = list(notes)
        self.embeddings = (
            np.asarray(embeddings, np.float32)
            if embeddings is not None
            else self.em.encode_atomic_notes(self.notes)
        )
        self._rebuild()

    def _rebuild(self) -> None:
        self.index = VectorIndex(
            dimension=self.embeddings.shape[1] if len(self.notes) else self.dimension,
            index_type=self.index_type, **self._index_kw,
        )
        if len(self.notes):
            self.index.add(self.embeddings)
        self._lexical = BM25Index(self.notes) if self.notes else None

    # ------------------------------------------------------------- search
    def search(
        self,
        queries: Sequence[str],
        top_k: Optional[int] = None,
        threshold: Optional[float] = None,
    ) -> List[List[Dict[str, Any]]]:
        """Per query: notes with retrieval_info, filtered by threshold."""
        if not self.notes:
            return [[] for _ in queries]
        top_k = top_k or self.top_k
        threshold = self.similarity_threshold if threshold is None else threshold
        q_emb = self.em.encode_queries(list(queries))
        scores, idx = self.index.search_arrays(q_emb, top_k)
        out: List[List[Dict[str, Any]]] = []
        for qi, query in enumerate(queries):
            rows = []
            for rank in range(scores.shape[1]):
                i = int(idx[qi, rank])
                s = float(scores[qi, rank])
                if i < 0 or s < threshold:
                    continue
                note = dict(self.notes[i])
                note["retrieval_info"] = {
                    "similarity": s, "rank": rank, "query": query, "method": "dense",
                }
                note["similarity"] = s
                note["final_score"] = s
                rows.append(note)
            out.append(rows)
        return out

    @log_performance
    def retrieve(
        self,
        query: str,
        top_k: Optional[int] = None,
        filter_fn: Optional[Callable[[Dict[str, Any]], bool]] = None,
        must_have_terms: Sequence[str] = (),
        boost_entities: Sequence[str] = (),
        boost_predicates: Sequence[str] = (),
        threshold: Optional[float] = None,
    ) -> List[Dict[str, Any]]:
        """4-stage enhanced retrieval: over-fetch, filter, adjust, cut."""
        if not self.notes:
            return []
        top_k = top_k or self.top_k
        threshold = self.similarity_threshold if threshold is None else threshold

        # stage 1: over-fetch
        q_emb = self.em.encode_queries([query])
        fetch = min(top_k * OVERFETCH, len(self.notes))
        scores, idx = self.index.search_arrays(q_emb, fetch)
        cands: List[Dict[str, Any]] = []
        for rank in range(scores.shape[1]):
            i = int(idx[0, rank])
            if i < 0:
                continue
            note = dict(self.notes[i])
            note["similarity"] = float(scores[0, rank])
            cands.append(note)

        # stage 2: filter
        if filter_fn:
            cands = [c for c in cands if filter_fn(c)]

        # stage 3: score adjustments (vectorized over the pool)
        if cands:
            sims = np.array([c["similarity"] for c in cands], np.float32)
            if must_have_terms:
                terms = [t.lower() for t in must_have_terms]
                has = np.array([
                    all(t in f"{c.get('title','')} {c.get('content','')}".lower() for t in terms)
                    for c in cands
                ])
                sims = np.where(has, sims, sims * MISS_PENALTY)
            if boost_entities:
                be = set(e.lower() for e in boost_entities)
                hit = np.array([
                    bool(be & set(str(e).lower() for e in (c.get("entities") or [])))
                    for c in cands
                ])
                sims = np.where(hit, sims * ENTITY_BOOST, sims)
            if boost_predicates:
                bp = [p.lower() for p in boost_predicates]
                hit = np.array([
                    any(p in (c.get("content") or "").lower() for p in bp) for c in cands
                ])
                sims = np.where(hit, sims * PREDICATE_BOOST, sims)
            for c, s in zip(cands, sims):
                c["adjusted_score"] = float(s)
                c["final_score"] = float(s)

        # stage 4: threshold + sort + cut
        cands = [c for c in cands if c.get("adjusted_score", 0.0) >= threshold]
        cands.sort(key=lambda c: -c["adjusted_score"])
        return cands[:top_k]

    def hybrid_search(self, queries: Sequence[str], top_k: Optional[int] = None,
                      sparse_weight: float = 0.6,
                      recall_target: float = 0.95) -> List[List[Dict[str, Any]]]:
        """Batched dense+BM25 hybrid search in one device pass.

        Completes the reference's search/retrieve/hybrid_search API triple
        (vector_store/retriever.py:186,339). Uses the candidate-union fused
        path (ops.topk.hybrid_topk): dense approx top-k u sorted-cumsum BM25
        top-m, cross-scored, fused as 1.0*dense + w*bm25_normalized.
        """
        return self.hybrid_search_finalize(
            self.hybrid_search_dispatch(queries, top_k=top_k,
                                        sparse_weight=sparse_weight,
                                        recall_target=recall_target))

    def hybrid_search_dispatch(self, queries: Sequence[str],
                               top_k: Optional[int] = None,
                               sparse_weight: float = 0.6,
                               recall_target: float = 0.95):
        """Issue the device pass WITHOUT waiting for results.

        Returns an opaque handle for hybrid_search_finalize. JAX dispatch is
        asynchronous, so the kernel runs while the caller does host work —
        the pipelined serving path overlaps batch i's answer stages with
        batch i+1's retrieval.
        """
        if not self.notes:
            return ("empty", list(queries))
        import jax.numpy as jnp

        from anorag_tpu.ops.bm25 import gather_plan_sorted
        from anorag_tpu.ops.topk import hybrid_topk

        top_k = top_k or self.top_k
        q_emb = self.em.encode_queries(list(queries))
        q_terms = [self._lexical_terms(q) for q in queries]
        doc_rows, weight_rows, _ = gather_plan_sorted(self._lexical.postings, q_terms)
        emb_dev = self.index.flat_device_emb()
        k_eff = min(top_k, len(self.notes))
        dense_k = min(max(4 * k_eff, 32), len(self.notes))
        # sparse depth matches dense: the 200k recall anatomy (round 5)
        # showed recall@10 is capped by SPARSE candidate depth — doubling
        # sparse_m lifted recall 0.9832->0.9898 while widening dense_k
        # moved nothing (bench.py operating-point note)
        sparse_m = min(max(4 * k_eff, 32), len(self.notes))
        q_prep = self.index._preprocess(q_emb)
        if self.index.is_sharded:
            # multi-chip: corpus rows ride the mesh 'data' axis; the fused
            # candidate-union search merges per-shard top-k over ICI
            fn = self.index.sharded_hybrid_fn(
                k_eff, dense_k, sparse_m, sparse_weight, recall_target)
            vals, ids = fn(emb_dev, jnp.asarray(q_prep, jnp.float32),
                           jnp.asarray(doc_rows), jnp.asarray(weight_rows))
            return ("pending", list(queries), vals, ids)
        # max term instances per query (bucketed pow2 for jit-shape reuse)
        # unlocks the scan-free windowed BM25 kernel
        max_seg = max((len(t) for t in q_terms), default=0)
        max_seg = min(1 << max(max_seg - 1, 0).bit_length(), 32) if max_seg else 0
        import jax

        if (jax.default_backend() == "tpu" and 0 < max_seg <= 32
                and doc_rows.shape[1] >= 2048):
            # L-major tiled plan: contiguous kernel DMAs; pow2 tile count
            # bounds the per-batch jit-shape set
            from anorag_tpu.ops.bm25 import plan_tiles

            doc_rows, weight_rows = plan_tiles(
                doc_rows, weight_rows, len(self.notes), round_pow2=True)
        vals, ids = hybrid_topk(
            emb_dev, jnp.asarray(q_prep, emb_dev.dtype),
            jnp.asarray(doc_rows), jnp.asarray(weight_rows),
            k_eff, n_docs=len(self.notes),
            dense_k=dense_k, sparse_m=sparse_m,
            sparse_weight=sparse_weight, recall_target=recall_target,
            max_seg=max_seg,
        )
        return ("pending", list(queries), vals, ids)

    def hybrid_search_finalize(self, handle) -> List[List[Dict[str, Any]]]:
        """Wait for a dispatched hybrid search and materialize note rows."""
        if handle[0] == "empty":
            return [[] for _ in handle[1]]
        _, queries, vals, ids = handle
        vals, ids = np.asarray(vals), np.asarray(ids)
        out: List[List[Dict[str, Any]]] = []
        for qi, query in enumerate(queries):
            rows = []
            for rank in range(vals.shape[1]):
                i = int(ids[qi, rank])
                if i < 0:
                    continue
                note = dict(self.notes[i])
                note["final_score"] = float(vals[qi, rank])
                note["retrieval_info"] = {"method": "hybrid", "rank": rank, "query": query}
                note["retrieval_method"] = "hybrid"
                rows.append(note)
            out.append(rows)
        return out

    def _lexical_terms(self, query: str) -> List[int]:
        return self._lexical.query_terms(query) if self._lexical else []

    def lexical_fallback_search(self, query: str, top_k: int = 20) -> List[Dict[str, Any]]:
        """Sparse fallback when dense retrieval returns nothing usable."""
        if not self._lexical:
            return []
        s, idx = self._lexical.topk(query, k=top_k)
        out = []
        for score, i in zip(s, idx):
            if score <= 0:
                continue
            note = dict(self.notes[int(i)])
            note["similarity"] = float(score)
            note["final_score"] = float(score)
            note["retrieval_info"] = {"method": "lexical_fallback"}
            out.append(note)
        return out

    def search_with_namespace_fallback(self, query: str, namespace: Optional[str],
                                       top_k: int = 20) -> List[Dict[str, Any]]:
        """Dense search filtered to a doc namespace; lexical fallback within
        the namespace when empty."""
        in_ns = (lambda c: namespace is None or str(c.get("doc_id")) == str(namespace))
        res = self.retrieve(query, top_k=top_k, filter_fn=in_ns, threshold=0.0)
        if not res:
            res = [c for c in self.lexical_fallback_search(query, top_k * 2) if in_ns(c)][:top_k]
        return res

    # -------------------------------------------------------- incremental
    def add_notes(self, new_notes: Sequence[Dict[str, Any]]) -> None:
        if not new_notes:
            return
        new_emb = self.em.encode_atomic_notes(list(new_notes))
        self.notes.extend(new_notes)
        self.embeddings = (
            new_emb if self.embeddings is None
            else np.concatenate([self.embeddings, new_emb])
        )
        self._rebuild()

    def remove_notes(self, note_ids: Sequence[str]) -> int:
        drop = set(note_ids)
        keep = [i for i, n in enumerate(self.notes) if n.get("note_id") not in drop]
        removed = len(self.notes) - len(keep)
        self.notes = [self.notes[i] for i in keep]
        self.embeddings = self.embeddings[keep] if self.embeddings is not None else None
        self._rebuild()
        return removed

    def update_note(self, note: Dict[str, Any]) -> bool:
        nid = note.get("note_id")
        for i, n in enumerate(self.notes):
            if n.get("note_id") == nid:
                self.notes[i] = dict(note)
                self.embeddings[i] = self.em.encode_atomic_notes([note])[0]
                self._rebuild()
                return True
        return False

    # -------------------------------------------------------- persistence
    def save(self, data_dir: str | Path) -> None:
        d = Path(data_dir)
        d.mkdir(parents=True, exist_ok=True)
        write_json(d / "atomic_notes.json", self.notes)
        np.savez_compressed(d / "note_embeddings.npz", embeddings=self.embeddings)
        write_json(d / "id_mappings.json",
                   {n.get("note_id"): i for i, n in enumerate(self.notes)})
        write_json(d / "model_signature.json", self.em.model_signature())

    def load(self, data_dir: str | Path, check_signature: bool = True) -> bool:
        d = Path(data_dir)
        if not (d / "atomic_notes.json").exists():
            return False
        sig_path = d / "model_signature.json"
        if check_signature and sig_path.exists():
            if not self.em.check_signature(read_json(sig_path)):
                logger.warning("model signature mismatch; refusing stale index at %s", d)
                return False
        self.notes = read_json(d / "atomic_notes.json")
        with np.load(d / "note_embeddings.npz") as z:
            self.embeddings = z["embeddings"]
        self._rebuild()
        return True


def optimize_retrieval_params(
    retriever: VectorRetriever,
    dev_queries: Sequence[str],
    gold_note_ids: Sequence[Sequence[str]],
    top_k_grid: Sequence[int] = (5, 10, 20),
    threshold_grid: Sequence[float] = (0.0, 0.2, 0.35, 0.5),
) -> Dict[str, Any]:
    """F1 sweep over (top_k, similarity_threshold) against labeled dev
    queries — the reference's retrieval param optimization
    (vector_store/retriever.py:767-822). Applies the best setting in place.
    """
    best = {"f1": -1.0, "top_k": retriever.top_k,
            "threshold": retriever.similarity_threshold}
    for tk in top_k_grid:
        for th in threshold_grid:
            f1_sum = 0.0
            for q, gold in zip(dev_queries, gold_note_ids):
                got = {n["note_id"] for n in
                       retriever.retrieve(q, top_k=tk, threshold=th)}
                gset = set(gold)
                if not got and not gset:
                    f1_sum += 1.0
                    continue
                if not got or not gset:
                    continue
                overlap = len(got & gset)
                if overlap:
                    p = overlap / len(got)
                    r = overlap / len(gset)
                    f1_sum += 2 * p * r / (p + r)
            f1 = f1_sum / max(len(dev_queries), 1)
            if f1 > best["f1"]:
                best = {"f1": f1, "top_k": tk, "threshold": th}
    retriever.top_k = best["top_k"]
    retriever.similarity_threshold = best["threshold"]
    logger.info("retrieval params tuned: %s", best)
    return best
