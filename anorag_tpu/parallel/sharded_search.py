"""Multi-chip dense search: shard-local top-k + cross-chip merge.

The corpus (N, D) is row-sharded over the mesh 'data' axis; every chip runs
the fused matmul+top-k over its shard, then the (scores, global ids) pairs
are all-gathered over ICI and re-topk'd — a k-sized collective instead of an
N-sized one (SURVEY.md §5.8(b)).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P
from jax import shard_map

from anorag_tpu.ops.topk import NEG_INF, dense_topk_xla
from anorag_tpu.parallel.mesh import DATA_AXIS


def make_sharded_topk(mesh: Mesh, k: int, n_total: int):
    """Builds a jitted (emb_sharded (N_pad, D), queries (B, D)) -> (vals, idx)
    searcher. `emb_sharded` rows must be sharded over 'data';
    ids returned are global row indices; rows >= n_total are masked out."""
    n_shards = mesh.shape[DATA_AXIS]

    def local_search(emb_local: jax.Array, queries: jax.Array):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        rows_per_shard = emb_local.shape[0]
        base = shard_id * rows_per_shard
        k_local = min(k, rows_per_shard)
        vals, idx = dense_topk_xla(emb_local, queries, k_local)
        gidx = idx + base
        valid = gidx < n_total
        vals = jnp.where(valid, vals, NEG_INF)
        if k_local < k:
            pad = ((0, 0), (0, k - k_local))
            vals = jnp.pad(vals, pad, constant_values=NEG_INF)
            gidx = jnp.pad(gidx, pad, constant_values=-1)
        # gather every shard's candidates, merge
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=0)    # (S, B, k)
        all_idx = jax.lax.all_gather(gidx, DATA_AXIS, axis=0)
        b = queries.shape[0]
        all_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, n_shards * k)
        all_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, n_shards * k)
        mv, mi = jax.lax.top_k(all_vals, k)
        return mv, jnp.take_along_axis(all_idx, mi, axis=1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_topk(mesh: Mesh, emb_sharded, queries, k: int, n_total: int) -> Tuple[jax.Array, jax.Array]:
    fn = make_sharded_topk(mesh, k, n_total)
    return fn(emb_sharded, jnp.asarray(queries))


def make_sharded_hybrid_topk(mesh: Mesh, k: int, n_total: int,
                             bias_weight: float = 0.6):
    """Hybrid variant: the (B, N) sparse score matrix is column-sharded over
    'data' in lockstep with the corpus rows; every chip fuses its slice
    locally, then the per-shard top-k merge rides ICI as in sharded_topk."""
    n_shards = mesh.shape[DATA_AXIS]

    def local_search(emb_local: jax.Array, bias_local: jax.Array, queries: jax.Array):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        rows_per_shard = emb_local.shape[0]
        base = shard_id * rows_per_shard
        k_local = min(k, rows_per_shard)
        qf = queries.astype(jnp.float32)
        scores = jnp.dot(qf, emb_local.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
        scores = scores + bias_weight * bias_local
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        gidx = base + col
        scores = jnp.where(gidx < n_total, scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, k_local)
        gi = jnp.take_along_axis(gidx, idx, axis=1)
        if k_local < k:
            pad = ((0, 0), (0, k - k_local))
            vals = jnp.pad(vals, pad, constant_values=NEG_INF)
            gi = jnp.pad(gi, pad, constant_values=-1)
        all_vals = jax.lax.all_gather(vals, DATA_AXIS, axis=0)
        all_idx = jax.lax.all_gather(gi, DATA_AXIS, axis=0)
        b = queries.shape[0]
        all_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(b, n_shards * k)
        all_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, n_shards * k)
        mv, mi = jax.lax.top_k(all_vals, k)
        return mv, jnp.take_along_axis(all_idx, mi, axis=1)

    fn = shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(None, DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_hybrid_union_topk(
    mesh: Mesh,
    k: int,
    n_total: int,
    dense_k: int = 128,
    sparse_m: int = 64,
    sparse_weight: float = 0.6,
    recall_target: float = 0.95,
):
    """Sharded candidate-union hybrid search — the multi-chip form of
    ops.topk.hybrid_topk (same fusion semantics, reference
    query_processor.py:2095-2165 fuses candidate LISTS, never a full scan).

    Corpus rows ride the 'data' axis; the (B, L) sorted BM25 posting plans
    are tiny and replicated. Per chip: local dense scores -> local top-k
    dense candidates + the local slice of the sparse candidates' dense
    cross-scores. Cross-chip: one psum (sparse cross-scores) and one
    k-sized all-gather (dense candidates) ride ICI; the final union top-k
    is replicated arithmetic over ~S*k + m entries.

    Returns a jitted (emb_sharded (N_pad, D) sharded over 'data',
    queries (B, D), doc_rows (B, L), weight_rows (B, L)) -> (vals, ids),
    ids are global corpus rows, -1 padded.
    """
    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted

    n_shards = mesh.shape[DATA_AXIS]

    def local_fn(emb_local, queries, sp_vals, sp_docs, inv_max):
        shard_id = jax.lax.axis_index(DATA_AXIS)
        rows = emb_local.shape[0]
        base = shard_id * rows
        qf = queries.astype(jnp.float32)
        scores = jnp.dot(qf, emb_local.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)      # (B, rows)
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        gidx = base + col
        scores = jnp.where(gidx < n_total, scores, NEG_INF)

        k_local = min(dense_k, rows)
        if jax.default_backend() == "tpu":
            d_vals, d_pos = jax.lax.approx_max_k(
                scores, k_local, recall_target=recall_target)
        else:
            d_vals, d_pos = jax.lax.top_k(scores, k_local)
        d_idx = jnp.where(d_vals > NEG_INF / 2, base + d_pos, -1)

        # this shard's slice of the sparse candidates' dense cross-scores;
        # the psum assembles the full (B, M) matrix over ICI
        sp_local = sp_docs - base
        in_range = (sp_local >= 0) & (sp_local < rows) & (sp_docs >= 0)
        gathered = jnp.take_along_axis(
            scores, jnp.clip(sp_local, 0, rows - 1), axis=1)
        sp_dense = jax.lax.psum(jnp.where(in_range, gathered, 0.0), DATA_AXIS)

        # BM25 score of the local dense candidates: equality match against
        # the replicated sparse top-m table (scatter-free; see hybrid_topk)
        eq = d_idx[:, :, None] == sp_docs[:, None, :]
        d_sparse = jnp.sum(jnp.where(eq, sp_vals[:, None, :], 0.0), axis=-1)
        fused_d = d_vals + sparse_weight * d_sparse * inv_max

        all_fd = jax.lax.all_gather(fused_d, DATA_AXIS, axis=0)   # (S, B, k_local)
        all_di = jax.lax.all_gather(d_idx, DATA_AXIS, axis=0)
        b = queries.shape[0]
        all_fd = jnp.transpose(all_fd, (1, 0, 2)).reshape(b, n_shards * k_local)
        all_di = jnp.transpose(all_di, (1, 0, 2)).reshape(b, n_shards * k_local)

        fused_s = sp_dense + sparse_weight * sp_vals * inv_max
        dup = jnp.any(sp_docs[:, :, None] == all_di[:, None, :], axis=-1)
        fused_s = jnp.where((sp_docs >= 0) & ~dup, fused_s, NEG_INF)

        av = jnp.concatenate([all_fd, fused_s], axis=1)
        ai = jnp.concatenate([all_di, sp_docs], axis=1)
        tv, tp = jax.lax.top_k(av, k)
        ids = jnp.take_along_axis(ai, tp, axis=1)
        return tv, jnp.where(tv > NEG_INF / 2, ids, -1)

    smapped = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def fn(emb_sharded, queries, doc_rows, weight_rows):
        _, sp_vals, sp_docs, sp_max = sparse_topm_from_sorted(
            doc_rows, weight_rows, sparse_m, n_total)
        inv_max = jnp.where(sp_max > 0, 1.0 / jnp.maximum(sp_max, 1e-30), 0.0)
        return smapped(emb_sharded, jnp.asarray(queries), sp_vals, sp_docs, inv_max)

    return jax.jit(fn)


def make_sharded_encode(mesh: Mesh, encode_fn):
    """Data-parallel batched encoding: token batches sharded over 'data',
    params replicated (or tp-sharded by their own PartitionSpecs)."""
    from jax.sharding import NamedSharding

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS, None))

    jitted = jax.jit(encode_fn)

    def encode(params, token_ids, mask):
        ids = jax.device_put(jnp.asarray(token_ids), batch_sharding)
        m = jax.device_put(jnp.asarray(mask), batch_sharding)
        return jitted(params, ids, m)

    return encode
