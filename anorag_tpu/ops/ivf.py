"""IVF (cluster-pruned) dense search.

Replaces FAISS IVFFlat search (/root/reference/vector_store/vector_index.py:
95-116,206-263) TPU-style: notes are k-means-clustered and stored sorted by
cluster; a query batch first scores the (nlist x D) centroid table, selects
`nprobe` clusters per query, and then scans ONLY the corpus blocks that the
selected clusters touch. Blocks to scan are computed on the host per batch
and fed to the kernel via scalar prefetch; per-row validity is enforced by
comparing each note's cluster id against the query's selected set, so
per-query nprobe semantics match FAISS exactly (not a batch-union
approximation).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from anorag_tpu.ops.kmeans import kmeans_fit
from anorag_tpu.ops.topk import NEG_INF, POS_INF, _round_up, _sort_topk, dense_topk_np


@dataclass
class IVFLayout:
    """Cluster-sorted corpus layout (host-side build artifact)."""

    centroids: np.ndarray       # (nlist, D) f32
    perm: np.ndarray            # (N,) sorted-position -> original index
    cluster_ids: np.ndarray     # (N_pad,) cluster id per sorted row (-1 pad)
    block_first_cluster: np.ndarray  # (num_blocks,)
    block_last_cluster: np.ndarray   # (num_blocks,)
    block_rows: int
    n: int
    _cid_dev: object = None   # cached device copy of cluster_ids

    def cluster_ids_device(self):
        if self._cid_dev is None:
            object.__setattr__(self, "_cid_dev", jnp.asarray(self.cluster_ids))
        return self._cid_dev

    @property
    def nlist(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_blocks(self) -> int:
        return len(self.block_first_cluster)


def build_ivf(
    emb: np.ndarray,
    nlist: int = 20,
    iters: int = 15,
    block_rows: int = 1024,
    seed: int = 0,
) -> Tuple[IVFLayout, np.ndarray]:
    """K-means + cluster-sort. Returns (layout, sorted embeddings (N_pad, D))."""
    n = emb.shape[0]
    nlist = max(1, min(nlist, n))
    centroids, assign = kmeans_fit(jnp.asarray(emb), nlist, iters=iters, seed=seed)
    centroids = np.asarray(centroids)
    assign = np.asarray(assign)
    perm = np.argsort(assign, kind="stable")
    sorted_emb = np.asarray(emb)[perm]
    sorted_cid = assign[perm]

    block_rows = max(128, min(block_rows, _round_up(n, 128)))
    n_pad = _round_up(n, block_rows)
    pad = n_pad - n
    if pad:
        sorted_emb = np.concatenate([sorted_emb, np.zeros((pad, emb.shape[1]), emb.dtype)])
        sorted_cid = np.concatenate([sorted_cid, np.full((pad,), -1, np.int32)])

    nb = n_pad // block_rows
    blocks = sorted_cid.reshape(nb, block_rows)
    valid = blocks >= 0
    first = np.where(valid.any(1), np.where(valid, blocks, np.iinfo(np.int32).max).min(1), -1)
    last = np.where(valid.any(1), blocks.max(1), -1)
    layout = IVFLayout(
        centroids=centroids,
        perm=perm.astype(np.int64),
        cluster_ids=sorted_cid.astype(np.int32),
        block_first_cluster=first.astype(np.int32),
        block_last_cluster=last.astype(np.int32),
        block_rows=block_rows,
        n=n,
    )
    return layout, sorted_emb


def select_blocks(layout: IVFLayout, probe_clusters: np.ndarray) -> np.ndarray:
    """Union of corpus blocks touched by any selected cluster in the batch.

    probe_clusters: (B, nprobe) int. Returns sorted unique block ids padded
    with -1 to a power-of-two bucket (static shape per bucket).
    """
    wanted = np.unique(probe_clusters.reshape(-1))
    wanted = wanted[wanted >= 0]
    # block touched iff its [first, last] cluster interval intersects the
    # wanted set — vectorized interval test over (num_blocks, n_wanted)
    lo = layout.block_first_cluster[:, None]
    hi = layout.block_last_cluster[:, None]
    mask = (lo[:, 0] >= 0) & np.any((wanted[None, :] >= lo) & (wanted[None, :] <= hi), axis=1)
    ids = np.nonzero(mask)[0].astype(np.int32)
    bucket = 1
    while bucket < max(len(ids), 1):
        bucket *= 2
    out = np.full((bucket,), -1, np.int32)
    out[: len(ids)] = ids
    return out


def _ivf_kernel(blk_ids_ref, nscan_ref, q_ref, sel_ref, e_ref, cid_ref,
                vals_out, idx_out, rv_ref, ri_ref, *, k: int, k_eff: int,
                block_rows: int):
    # k = 128-aligned scratch width; k_eff = logical top-k. Pad slots are
    # pinned at +INF (never the running min) so the merge needs only k_eff
    # rounds — same trick as ops/topk.py, ~10x at k=10.
    i = pl.program_id(0)
    n_steps = pl.num_programs(0)
    b_rows, k_slots = rv_ref.shape
    colk_init = jax.lax.broadcasted_iota(jnp.int32, (b_rows, k_slots), 1)

    @pl.when(i == 0)
    def _init():
        rv_ref[:] = jnp.where(colk_init < k_eff, NEG_INF, POS_INF)
        ri_ref[:] = jnp.zeros_like(ri_ref)

    @pl.when(i < nscan_ref[0])
    def _scan():
        q = q_ref[:]                  # (B, D)
        e = e_ref[:]                  # (block_rows, D)
        scores = jax.lax.dot_general(
            q, e, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        b_dim, nb = scores.shape
        base = blk_ids_ref[i] * block_rows
        # per-query cluster validity: row cluster id in query's probe set
        cids = cid_ref[:]             # (1, block_rows) i32
        sel = sel_ref[:]              # (B, nprobe) i32
        nprobe = sel.shape[1]
        valid = jnp.zeros((b_dim, nb), dtype=jnp.bool_)
        for p in range(nprobe):       # static tiny loop
            valid = valid | (cids == sel[:, p][:, None])
        scores = jnp.where(valid, scores, NEG_INF)

        can_improve = jnp.max(scores) > jnp.min(rv_ref[:])

        @pl.when(can_improve)
        def _merge():
            col = jax.lax.broadcasted_iota(jnp.int32, (b_dim, nb), 1)
            colk = jax.lax.broadcasted_iota(jnp.int32, (b_dim, k), 1)

            def body(_, carry):
                sc, rv, ri = carry
                bmax = jnp.max(sc, axis=1, keepdims=True)
                barg = jnp.min(jnp.where(sc == bmax, col, nb), axis=1, keepdims=True)
                rmin = jnp.min(rv, axis=1, keepdims=True)
                rarg = jnp.min(jnp.where(rv == rmin, colk, k), axis=1, keepdims=True)
                take = bmax > rmin
                repl = (colk == rarg) & take
                rv = jnp.where(repl, bmax, rv)
                ri = jnp.where(repl, base + barg, ri)
                sc = jnp.where((col == barg) & take, NEG_INF, sc)
                return sc, rv, ri

            _, rv_f, ri_f = jax.lax.fori_loop(0, k_eff, body, (scores, rv_ref[:], ri_ref[:]))
            rv_ref[:] = rv_f
            ri_ref[:] = ri_f

    @pl.when(i == n_steps - 1)
    def _emit():
        vals_out[:] = jnp.where(colk_init < k_eff, rv_ref[:], NEG_INF)
        idx_out[:] = ri_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "k_eff", "block_rows", "interpret"))
def _ivf_search_pallas(emb, cid, queries, sel, blk_ids, n_scan, k, k_eff, block_rows, interpret):
    n_pad, d = emb.shape
    b_pad = queries.shape[0]
    max_steps = blk_ids.shape[0]
    kernel = functools.partial(_ivf_kernel, k=k, k_eff=k_eff, block_rows=block_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(max_steps,),
        in_specs=[
            pl.BlockSpec((b_pad, d), lambda i, bids, ns: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, sel.shape[1]), lambda i, bids, ns: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (block_rows, d),
                lambda i, bids, ns: (jnp.maximum(bids[i], 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_rows),
                lambda i, bids, ns: (0, jnp.maximum(bids[i], 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((b_pad, k), lambda i, bids, ns: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k), lambda i, bids, ns: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, k), jnp.float32),
            pltpu.VMEM((b_pad, k), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        interpret=interpret,
    )(blk_ids, n_scan, queries, sel, emb, cid.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("nprobe",))
def _probe_jit(centroids, queries, nprobe: int):
    scores = jnp.dot(queries, centroids.T, preferred_element_type=jnp.float32)
    _, idx = jax.lax.top_k(scores, nprobe)
    return idx


def ivf_probe(layout: IVFLayout, queries: np.ndarray, nprobe: int) -> np.ndarray:
    """Top-nprobe centroids per query (one jitted matmul — nlist is tiny)."""
    nprobe = min(nprobe, layout.nlist)
    idx = _probe_jit(jnp.asarray(layout.centroids),
                     jnp.asarray(queries, jnp.float32), nprobe)
    return np.asarray(idx, np.int32)


def ivf_search(
    layout: IVFLayout,
    sorted_emb: jax.Array,
    queries: np.ndarray,
    k: int,
    nprobe: int = 4,
    use_pallas: bool | None = None,
    interpret: bool | None = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """IVF top-k. Returns (scores (B,k), ORIGINAL indices (B,k)), sorted desc.

    Missing slots (fewer than k valid rows in probed clusters) have index -1.
    """
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is None:
        use_pallas = True
    if interpret is None:
        interpret = not on_tpu

    b = queries.shape[0]
    # VMEM budget: the kernel holds queries + corpus block + (B, block) f32
    # score tile + merge temporaries. At block_rows=1024/D=1024, B=512
    # overflows the ~16MB scoped vmem — chunk the batch (shape-stable:
    # every chunk reuses the same compiled kernel).
    # measured: B=512/block=1024/D=1024 allocates 17.4M -> ~26KB VMEM per
    # query row at block 1024 (+4MB corpus block); keep rows under ~9MB and
    # floor to a power of two so every chunk hits the same compiled shape
    max_b = max(64, (9 * 1024 * 1024) // (layout.block_rows * 26))
    max_b = 1 << (max_b.bit_length() - 1)
    if use_pallas and b > max_b:
        parts = [
            ivf_search(layout, sorted_emb, queries[i:i + max_b], k, nprobe=nprobe,
                       use_pallas=use_pallas, interpret=interpret)
            for i in range(0, b, max_b)
        ]
        return (np.concatenate([p[0] for p in parts], axis=0),
                np.concatenate([p[1] for p in parts], axis=0))
    sel = ivf_probe(layout, queries, nprobe)          # (B, nprobe)
    nprobe_eff = sel.shape[1]
    if not use_pallas:
        return _ivf_search_np(layout, np.asarray(sorted_emb, np.float32), queries, k, sel)

    blk_ids = select_blocks(layout, sel)
    n_scan = np.array([int((blk_ids >= 0).sum())], np.int32)

    b_pad = _round_up(max(b, 8), 8)
    k_eff = min(k, layout.n)
    k_pad = min(_round_up(k_eff, 128), _round_up(layout.n, 128))
    qp = np.zeros((b_pad, queries.shape[1]), np.float32)
    qp[:b] = queries
    selp = np.full((b_pad, nprobe_eff), -2, np.int32)  # -2 never matches a cid
    selp[:b] = sel

    emb_dev = jnp.asarray(sorted_emb)
    vals, idx = _ivf_search_pallas(
        emb_dev, layout.cluster_ids_device(), jnp.asarray(qp, emb_dev.dtype),
        jnp.asarray(selp), jnp.asarray(blk_ids), jnp.asarray(n_scan),
        k_pad, k_eff, layout.block_rows, interpret,
    )
    vals, idx = _sort_topk(vals[:b], idx[:b], k_pad)
    vals = np.asarray(vals[:, :k_eff])
    idx = np.asarray(idx[:, :k_eff])
    # map sorted positions back to original ids; mask never-filled slots
    filled = vals > NEG_INF / 2
    orig = np.where(filled, layout.perm[np.clip(idx, 0, layout.n - 1)], -1)
    vals = np.where(filled, vals, -np.inf)
    if k_eff < k:
        orig = np.pad(orig, ((0, 0), (0, k - k_eff)), constant_values=-1)
        vals = np.pad(vals, ((0, 0), (0, k - k_eff)), constant_values=-np.inf)
    return vals, orig


def _ivf_search_np(layout, sorted_emb, queries, k, sel):
    """Numpy oracle with identical per-query nprobe semantics."""
    b = queries.shape[0]
    vals = np.full((b, k), -np.inf, np.float32)
    idx = np.full((b, k), -1, np.int64)
    cids = layout.cluster_ids[: layout.n]
    for qi in range(b):
        mask = np.isin(cids, sel[qi])
        rows = np.nonzero(mask)[0]
        if len(rows) == 0:
            continue
        scores = sorted_emb[rows] @ queries[qi].astype(np.float32)
        kk = min(k, len(rows))
        top = np.argpartition(-scores, kk - 1)[:kk]
        top = top[np.argsort(-scores[top], kind="stable")]
        vals[qi, :kk] = scores[top]
        idx[qi, :kk] = layout.perm[rows[top]]
    return vals, idx


def tune_nprobe(
    layout: IVFLayout,
    sorted_emb,
    emb_f32: np.ndarray,
    sample_queries: np.ndarray,
    k: int = 10,
    target_recall: float = 0.9,
    **search_kw,
) -> int:
    """Sweep nprobe until recall@k vs exact search reaches the target —
    the FAISS nprobe autotune contract
    (/root/reference/vector_store/vector_index.py:428-491)."""
    _, exact_idx = dense_topk_np(emb_f32, sample_queries, k)
    for nprobe in range(1, layout.nlist + 1):
        _, idx = ivf_search(layout, sorted_emb, sample_queries, k, nprobe=nprobe, **search_kw)
        hits = np.mean([
            len(set(idx[q]) & set(exact_idx[q])) / k for q in range(len(sample_queries))
        ])
        if hits >= target_recall:
            return nprobe
    return layout.nlist
