"""VectorIndex: the dense ANN index (FAISS replacement).

Parity target: /root/reference/vector_store/vector_index.py — index types,
cosine-as-inner-product with explicit normalization (:265-282), dynamic
nlist shrink when training data is scarce (:140-155), search result rows
{index, score, rank, similarity} (:206-263), save/load with a metadata
sidecar (:284-364), and nprobe autotuning to a target recall (:428-491).

TPU design: embeddings live in HBM (optionally bf16); Flat search is the
fused matmul+top-k kernel; IVFFlat is the cluster-pruned variant; IVFPQ is
the product-quantized compressed scan (ops/pq.py one-hot MXU contraction
or the default ops/sq.py rotated-int8 sketch + exact host refine) for
corpora beyond HBM; LSH is the sign-sketch Hamming scan as a ±1 int8 MXU
matmul + refine (ops/lsh.py); HNSW is the native C++ graph index
(native/anorag_native.cpp) for the small-batch regime where a batched MXU
scan doesn't pay — it degrades to Flat only when no C++ toolchain exists.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.ivf import build_ivf, ivf_search, tune_nprobe
from anorag_tpu.ops.topk import dense_topk, dense_topk_np
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.index")


class VectorIndex:
    def __init__(
        self,
        dimension: int = 1024,
        index_type: str = "IVFFlat",
        metric: str = "cosine",
        nlist: int = 20,
        nprobe: int = 4,
        storage_dtype: str = "bfloat16",
        use_pallas: Optional[bool] = None,
        ivf_min_corpus: int = 5_000_000,
        recall_target: float = 0.95,
        mesh=None,
        pq_m: int = 0,
        pq_rerank: int = 0,
        pq_impl: str = "sketch",
        lsh_bits: int = 0,
        hnsw_m: int = 16,
        ef_construction: int = 200,
        ef_search: int = 0,
    ):
        if index_type == "PQ":
            index_type = "IVFPQ"
        if index_type == "HNSW":
            from anorag_tpu import native

            if not native.available():
                logger.info("HNSW needs the native runtime; degrading to Flat")
                index_type = "Flat"
        assert index_type in ("Flat", "IVFFlat", "IVFPQ", "LSH", "HNSW"), index_type
        self.dimension = dimension
        self.index_type = index_type
        # Below this corpus size the fused flat scan beats cluster pruning on
        # TPU, so IVFFlat quietly uses the flat path. Measured at 1M x 1024,
        # B=512 (scripts/bench_ivf_1m.py): flat approx 14.3k QPS @ recall
        # 0.98 vs IVF <1k QPS — large batches union most clusters (the probe
        # sets of 512 queries touch nearly every block), so pruning saves
        # nothing while the validity masking adds cost. IVF pays only for
        # huge corpora with small batches.
        self.ivf_min_corpus = ivf_min_corpus
        self.metric = metric
        self.nlist = nlist
        self.nprobe = nprobe
        self.storage_dtype = storage_dtype
        self.use_pallas = use_pallas
        self.recall_target = recall_target
        # Multi-chip: when a jax.sharding.Mesh is given, Flat embeddings are
        # row-sharded over its 'data' axis and search runs the shard-local
        # top-k + ICI merge (parallel/sharded_search.py). IVF layouts stay
        # single-device (they only pay off in the huge-corpus small-batch
        # regime; see ivf_min_corpus note above).
        self.mesh = mesh
        self._sharded_fns: Dict[Any, Any] = {}
        # IVFPQ: the code matrix is the only corpus-sized device residency
        # (16-32x smaller than bf16 rows) — the index type for corpora
        # beyond HBM. pq_m 0 = auto (D/8 code bytes per row), pq_rerank 0 =
        # auto (4k exact-refine pool). impl 'sketch' = rotated int8 scan
        # (ops/sq.py, MXU-native, default), 'codebook' = classic PQ ADC
        # via one-hot contraction (ops/pq.py).
        self.pq_m = pq_m
        self.pq_rerank = pq_rerank
        self.pq_impl = pq_impl
        # LSH: ±1 sign-sketch scan (ops/lsh.py). lsh_bits 0 = auto (D bits,
        # the FAISS IndexLSH default — 4x smaller than f32 rows).
        self.lsh_bits = lsh_bits
        # HNSW: native C++ graph (host-side; the small-batch regime).
        # ef_search 0 = auto (max(64, 4k) at query time).
        self.hnsw_m = hnsw_m
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        self._pq_codebooks: Optional[np.ndarray] = None
        self._pq_codes = None
        self._sq_rotation: Optional[np.ndarray] = None
        self._sq_codes = None
        self._sq_scales = None
        self._lsh_planes: Optional[np.ndarray] = None
        self._lsh_codes = None
        self._hnsw = None
        self._emb_f32: Optional[np.ndarray] = None   # host copy (original order)
        self._device_emb = None                       # flat: (N,D); ivf: sorted
        self._layout = None
        self._dirty = False

    # ----------------------------------------------------------- building
    @property
    def ntotal(self) -> int:
        return 0 if self._emb_f32 is None else len(self._emb_f32)

    def _preprocess(self, vecs: np.ndarray) -> np.ndarray:
        """cosine => L2-normalize so inner product == cosine (the explicit
        normalization contract, reference :265-282)."""
        vecs = np.ascontiguousarray(vecs, np.float32)
        if self.metric == "cosine":
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs / np.maximum(norms, 1e-12)
        return vecs

    def add(self, vectors: np.ndarray) -> None:
        vecs = self._preprocess(vectors)
        assert vecs.shape[1] == self.dimension, (vecs.shape, self.dimension)
        self._emb_f32 = vecs if self._emb_f32 is None else np.concatenate([self._emb_f32, vecs])
        self._dirty = True
        self._flat_cache = None

    def _effective_nlist(self, n: int) -> int:
        # shrink nlist when training data is scarce (reference :140-155)
        nlist = self.nlist
        while nlist > 1 and n < 2 * nlist:
            nlist //= 2
        return max(1, nlist)

    @property
    def _effective_type(self) -> str:
        if self.index_type == "IVFFlat" and self.ntotal < self.ivf_min_corpus:
            return "Flat"
        return self.index_type

    def _pq_m_auto(self) -> int:
        if self.pq_m:
            return self.pq_m
        d = self.dimension
        for sub in (8, 4, 2, 1):
            if d % sub == 0:
                return d // sub
        return d

    @property
    def is_sharded(self) -> bool:
        return self.mesh is not None and self._effective_type == "Flat"

    def _materialize(self) -> None:
        if not self._dirty or self._emb_f32 is None:
            return
        dtype = jnp.bfloat16 if self.storage_dtype == "bfloat16" else jnp.float32
        if self._effective_type == "Flat":
            if self.mesh is not None:
                from anorag_tpu.parallel.mesh import shard_rows

                sharded, _ = shard_rows(self.mesh, self._emb_f32)
                self._device_emb = jnp.asarray(sharded, dtype)
                self._sharded_fns.clear()
            else:
                self._device_emb = jnp.asarray(self._emb_f32, dtype)
            self._layout = None
        elif self._effective_type == "IVFPQ":
            if self.pq_impl == "codebook":
                from anorag_tpu.ops.pq import encode_pq, train_pq

                if self._pq_codebooks is None:
                    self._pq_codebooks = train_pq(self._emb_f32, self._pq_m_auto())
                codes = encode_pq(self._emb_f32, self._pq_codebooks)
                self._pq_codes = jnp.asarray(codes)
            else:
                from anorag_tpu.ops.sq import encode_sq, train_sq

                if self._sq_rotation is None:
                    self._sq_rotation = train_sq(self._emb_f32, self._pq_m_auto())
                codes, scales = encode_sq(self._emb_f32, self._sq_rotation)
                self._sq_codes = jnp.asarray(codes)
                self._sq_scales = jnp.asarray(scales)
            self._device_emb = None
            self._layout = None
        elif self._effective_type == "LSH":
            from anorag_tpu.ops.lsh import encode_lsh, train_lsh

            if self._lsh_planes is None:
                self._lsh_planes = train_lsh(
                    self.dimension, self.lsh_bits or self.dimension)
            self._lsh_planes_dev = jnp.asarray(self._lsh_planes)
            self._lsh_codes = jnp.asarray(encode_lsh(self._emb_f32, self._lsh_planes))
            self._device_emb = None
            self._layout = None
        elif self._effective_type == "HNSW":
            from anorag_tpu.native import HNSWNative

            self._hnsw = HNSWNative(
                self._emb_f32, m=self.hnsw_m,
                ef_construction=self.ef_construction)
            self._device_emb = None
            self._layout = None
        else:
            nlist = self._effective_nlist(self.ntotal)
            self._layout, sorted_emb = build_ivf(self._emb_f32, nlist=nlist)
            self._device_emb = jnp.asarray(sorted_emb, dtype)
        self._dirty = False

    # ------------------------------------------------------------- search
    def search(self, queries: np.ndarray, top_k: int = 10,
               nprobe: Optional[int] = None) -> List[List[Dict[str, Any]]]:
        """Row dicts {index, score, rank, similarity} per query; `index` -1
        rows (fewer than k valid hits) are dropped."""
        scores, idx = self.search_arrays(queries, top_k, nprobe)
        out: List[List[Dict[str, Any]]] = []
        for qi in range(len(scores)):
            rows = []
            for rank in range(scores.shape[1]):
                i = int(idx[qi, rank])
                if i < 0:
                    continue
                s = float(scores[qi, rank])
                rows.append({"index": i, "score": s, "rank": rank, "similarity": s})
            out.append(rows)
        return out

    def search_arrays(self, queries: np.ndarray, top_k: int,
                      nprobe: Optional[int] = None):
        """(scores (B,k), indices (B,k) with -1 padding)."""
        if self.ntotal == 0:
            b = len(np.atleast_2d(queries))
            return np.full((b, top_k), -np.inf, np.float32), np.full((b, top_k), -1, np.int64)
        self._materialize()
        q = self._preprocess(np.atleast_2d(queries))
        if self._effective_type == "Flat":
            if self.mesh is not None:
                vals, idx = self._sharded_dense_fn(min(top_k, self.ntotal))(
                    self._device_emb, jnp.asarray(q, self._device_emb.dtype))
                vals, idx = np.asarray(vals), np.asarray(idx, np.int64)
                if vals.shape[1] < top_k:
                    pad = ((0, 0), (0, top_k - vals.shape[1]))
                    vals = np.pad(vals, pad, constant_values=-np.inf)
                    idx = np.pad(idx, pad, constant_values=-1)
                return vals, idx
            vals, idx = dense_topk(self._device_emb, jnp.asarray(q, self._device_emb.dtype),
                                   top_k, use_pallas=self.use_pallas,
                                   recall_target=self.recall_target)
            return np.asarray(vals), np.asarray(idx, np.int64)
        if self._effective_type == "IVFPQ":
            # refine pool must grow with corpus size: at ~500 rows per
            # cluster the compressed scores can't isolate the true top-10
            # inside a fixed 100-candidate pool (measured recall@10 0.46-
            # 0.61 at 2M); n/500 capped at 1024 restores >= 0.99
            cand = self.pq_rerank or min(
                max(4 * top_k, self.ntotal // 500, 64),
                max(1024, 4 * top_k))
            if self.pq_impl == "codebook":
                from anorag_tpu.ops.pq import pq_search

                vals, idx = pq_search(
                    self._pq_codes, self._pq_codebooks, q, top_k,
                    emb_host=self._emb_f32, candidates=cand,
                )
            else:
                from anorag_tpu.ops.sq import sq_search

                vals, idx = sq_search(
                    self._sq_codes, self._sq_scales, self._sq_rotation, q,
                    top_k, emb_host=self._emb_f32, candidates=cand,
                )
            return vals, idx.astype(np.int64)
        if self._effective_type == "LSH":
            from anorag_tpu.ops.lsh import lsh_search

            cand = self.pq_rerank or min(
                max(4 * top_k, self.ntotal // 500, 64),
                max(1024, 4 * top_k))
            # exact refine on device when the full-precision rows fit HBM
            # (host refine is 1000x slower on weak hosts); beyond that LSH
            # keeps only codes on device and refines against host rows
            small = self.ntotal * self.dimension * 2 <= 4 * 1024**3
            vals, idx = lsh_search(
                self._lsh_codes, self._lsh_planes_dev, q, top_k,
                emb_host=self._emb_f32,
                emb_dev=self.flat_device_emb() if small else None,
                candidates=cand,
            )
            return vals, idx.astype(np.int64)
        if self._effective_type == "HNSW":
            ef = self.ef_search or max(64, 4 * top_k)
            vals, idx = self._hnsw.search(q, min(top_k, self.ntotal), ef_search=ef)
            idx = idx.astype(np.int64)
            if vals.shape[1] < top_k:
                pad = ((0, 0), (0, top_k - vals.shape[1]))
                vals = np.pad(vals, pad, constant_values=-np.inf)
                idx = np.pad(idx, pad, constant_values=-1)
            return vals, idx
        vals, idx = ivf_search(
            self._layout, self._device_emb, q, top_k,
            nprobe=nprobe or self.nprobe, use_pallas=self.use_pallas,
        )
        return vals, idx.astype(np.int64)

    def _sharded_dense_fn(self, k_eff: int):
        """Cached jitted shard-local top-k + ICI merge for this (k, N)."""
        key = ("dense", k_eff, self.ntotal)
        fn = self._sharded_fns.get(key)
        if fn is None:
            from anorag_tpu.parallel.sharded_search import make_sharded_topk

            fn = make_sharded_topk(self.mesh, k_eff, self.ntotal)
            self._sharded_fns[key] = fn
        return fn

    def sharded_hybrid_fn(self, k_eff: int, dense_k: int, sparse_m: int,
                          sparse_weight: float, recall_target: float):
        """Cached jitted sharded candidate-union hybrid searcher."""
        key = ("hybrid", k_eff, dense_k, sparse_m, sparse_weight,
               recall_target, self.ntotal)
        fn = self._sharded_fns.get(key)
        if fn is None:
            from anorag_tpu.parallel.sharded_search import (
                make_sharded_hybrid_union_topk,
            )

            fn = make_sharded_hybrid_union_topk(
                self.mesh, k_eff, self.ntotal, dense_k=dense_k,
                sparse_m=sparse_m, sparse_weight=sparse_weight,
                recall_target=recall_target)
            self._sharded_fns[key] = fn
        return fn

    def reconstruct(self, i: int) -> np.ndarray:
        return self._emb_f32[i]

    def flat_device_emb(self):
        """Device embeddings in ORIGINAL row order (the IVF layout is
        cluster-sorted; callers indexing by corpus id need this view)."""
        self._materialize()
        if self._effective_type == "Flat":
            return self._device_emb
        if getattr(self, "_flat_cache", None) is None:
            dtype = jnp.bfloat16 if self.storage_dtype == "bfloat16" else jnp.float32
            self._flat_cache = jnp.asarray(self._emb_f32, dtype)
        return self._flat_cache

    # ------------------------------------------------------------- tuning
    def optimize_search_params(self, sample_queries: np.ndarray, top_k: int = 10,
                               target_recall: float = 0.9) -> int:
        """Sweep nprobe to the smallest value reaching target recall."""
        if self._effective_type != "IVFFlat" or self.ntotal == 0:
            return self.nprobe
        self._materialize()
        q = self._preprocess(np.atleast_2d(sample_queries))
        self.nprobe = tune_nprobe(
            self._layout, self._device_emb, self._emb_f32, q,
            k=top_k, target_recall=target_recall, use_pallas=self.use_pallas,
        )
        logger.info("nprobe tuned to %d for recall>=%.2f", self.nprobe, target_recall)
        return self.nprobe

    def measure_recall(self, sample_queries: np.ndarray, top_k: int = 10) -> float:
        q = self._preprocess(np.atleast_2d(sample_queries))
        _, exact = dense_topk_np(self._emb_f32, q, top_k)
        _, got = self.search_arrays(q, top_k)
        return float(np.mean([
            len(set(got[i]) & set(exact[i])) / top_k for i in range(len(q))
        ]))

    # -------------------------------------------------------- persistence
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        arrays = {"embeddings": self._emb_f32}
        if self._pq_codebooks is not None:
            arrays["pq_codebooks"] = self._pq_codebooks
        if self._sq_rotation is not None:
            arrays["sq_rotation"] = self._sq_rotation
        if self._lsh_planes is not None:
            arrays["lsh_planes"] = self._lsh_planes
        if self._effective_type == "HNSW" and self._emb_f32 is not None:
            self._materialize()  # graph must exist (and be current) to serialize
        if self._effective_type == "HNSW" and not self._dirty and self._hnsw is not None:
            # serialize the adjacency lists: the parallel build's link sets
            # vary with thread interleaving, so a rebuild-from-embeddings
            # would NOT return identical results to the saved index
            g = self._hnsw.export_graph()
            arrays["hnsw_meta"] = g["meta"]
            arrays["hnsw_node_level"] = g["node_level"]
            arrays["hnsw_links"] = g["links"]
        np.savez_compressed(str(path.with_suffix(".npz")), **arrays)
        meta = {
            "dimension": self.dimension,
            "index_type": self.index_type,
            "metric": self.metric,
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "ntotal": self.ntotal,
            "storage_dtype": self.storage_dtype,
            "pq_m": self.pq_m,
            "pq_rerank": self.pq_rerank,
            "pq_impl": self.pq_impl,
            "lsh_bits": self.lsh_bits,
            "hnsw_m": self.hnsw_m,
            "ef_construction": self.ef_construction,
            "ef_search": self.ef_search,
        }
        with open(path.with_name(path.stem + "_metadata.json"), "w") as fh:
            json.dump(meta, fh, indent=2)

    @classmethod
    def load(cls, path: str | Path, use_pallas: Optional[bool] = None) -> "VectorIndex":
        path = Path(path)
        with open(path.with_name(path.stem + "_metadata.json")) as fh:
            meta = json.load(fh)
        idx = cls(
            dimension=meta["dimension"], index_type=meta["index_type"],
            metric=meta["metric"], nlist=meta["nlist"], nprobe=meta["nprobe"],
            storage_dtype=meta.get("storage_dtype", "bfloat16"), use_pallas=use_pallas,
            pq_m=meta.get("pq_m", 0), pq_rerank=meta.get("pq_rerank", 0),
            pq_impl=meta.get("pq_impl", "sketch"),
            lsh_bits=meta.get("lsh_bits", 0), hnsw_m=meta.get("hnsw_m", 16),
            ef_construction=meta.get("ef_construction", 200),
            ef_search=meta.get("ef_search", 0),
        )
        data = np.load(str(path.with_suffix(".npz")))
        if "pq_codebooks" in data:
            idx._pq_codebooks = data["pq_codebooks"]
        if "sq_rotation" in data:
            idx._sq_rotation = data["sq_rotation"]
        if "lsh_planes" in data:
            idx._lsh_planes = data["lsh_planes"]
        emb = data["embeddings"]
        if len(emb):
            # already normalized at save time; bypass re-normalization
            idx._emb_f32 = np.ascontiguousarray(emb, np.float32)
            idx._dirty = True
            if "hnsw_meta" in data and idx._effective_type == "HNSW":
                from anorag_tpu.native import HNSWNative

                idx._hnsw = HNSWNative.from_graph(idx._emb_f32, {
                    "meta": data["hnsw_meta"],
                    "node_level": data["hnsw_node_level"],
                    "links": data["hnsw_links"],
                })
                idx._device_emb = None
                idx._layout = None
                idx._dirty = False
        return idx
