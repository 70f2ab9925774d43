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
