"""Fused dot-product + top-k — the dense retrieval kernel.

This replaces the reference's FAISS Flat index search
(/root/reference/vector_store/vector_index.py:77-116,206-263) with a single
Pallas kernel that streams the (N x D) corpus through VMEM block by block,
computes the query-block score matmul on the MXU, and maintains a running
per-query top-k in VMEM scratch — N scores are never materialized to HBM.

Algorithm (streaming top-k):
  * scratch holds (B, K) running values/indices across sequential grid steps;
  * per corpus block: scores = Q @ E_blk^T (MXU, f32 accum);
  * a block is merged only if max(block) > min(running) — after warm-up most
    blocks are rejected by this single reduction;
  * merge = K rounds of extract-block-max / replace-running-min, which is
    exact: at most K block elements can enter the running set, and after K
    extractions every remaining block element is <= the running minimum.

The XLA fallback (`dense_topk_xla`) is the numerical oracle for parity tests
and the non-TPU path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38  # python float: jnp scalars would be captured as consts in pallas
POS_INF = 3.0e38


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _topk_kernel(nvalid_ref, q_ref, e_ref, *rest,
                 k: int, k_eff: int, block_rows: int, has_bias: bool = False,
                 bias_weight: float = 1.0):
    # k is the 128-aligned scratch width (VMEM lane constraint); k_eff is the
    # logical top-k. Only k_eff slots are live — the k - k_eff pad slots are
    # pinned at +INF so they are never the running min (never replaced) and
    # the merge loop needs only k_eff rounds for exactness, not k. At k=10
    # this cut the merge from 128 rounds/block to 10 and the kernel time ~10x.
    if has_bias:
        bias_ref, vals_out, idx_out, rv_ref, ri_ref = rest
    else:
        bias_ref = None
        vals_out, idx_out, rv_ref, ri_ref = rest
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    b_rows, k_slots = rv_ref.shape
    colk_init = jax.lax.broadcasted_iota(jnp.int32, (b_rows, k_slots), 1)

    @pl.when(i == 0)
    def _init():
        rv_ref[:] = jnp.where(colk_init < k_eff, NEG_INF, POS_INF)
        ri_ref[:] = jnp.zeros_like(ri_ref)

    q = q_ref[:]                      # (B, D)
    e = e_ref[:]                      # (block_rows, D)
    scores = jax.lax.dot_general(
        q, e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (B, block_rows)
    if bias_ref is not None:
        # fused hybrid search: the (pre-normalized) sparse score slice is
        # added while the dense block is in VMEM — no (B, N) fused-score
        # matrix ever reaches HBM.
        scores = scores + bias_weight * bias_ref[:]

    base = i * block_rows
    b_dim, nb = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b_dim, nb), 1)
    valid = (base + col) < nvalid_ref[0]
    scores = jnp.where(valid, scores, NEG_INF)

    # Global reject test: if the best block score cannot beat the worst
    # running score on any row, skip the merge entirely.
    can_improve = jnp.max(scores) > jnp.min(rv_ref[:])

    @pl.when(can_improve)
    def _merge():
        colk = jax.lax.broadcasted_iota(jnp.int32, (b_dim, k), 1)

        # k_eff rounds of extract-block-max / replace-running-min. At most
        # k_eff block elements can enter the live running set, and after
        # k_eff extractions every remaining block element is <= the running
        # minimum — exact. (+INF pad slots are never the min, so the live
        # set is exactly k_eff wide.) A while_loop that exits when the block
        # is exhausted was measured 15-30x SLOWER on TPU (Mosaic pipelines
        # the bounded fori; data-dependent trip counts serialize), so the
        # fixed-round form stays.
        def body(_, carry):
            sc, rv, ri = carry
            bmax = jnp.max(sc, axis=1, keepdims=True)            # (B, 1)
            # argmax via first matching column (stable for ties)
            barg = jnp.min(jnp.where(sc == bmax, col, nb), axis=1, keepdims=True)
            rmin = jnp.min(rv, axis=1, keepdims=True)
            rarg = jnp.min(jnp.where(rv == rmin, colk, k), axis=1, keepdims=True)
            take = bmax > rmin                                    # (B, 1)
            sel = (colk == rarg) & take
            rv = jnp.where(sel, bmax, rv)
            ri = jnp.where(sel, base + barg, ri)
            sc = jnp.where((col == barg) & take, NEG_INF, sc)
            return sc, rv, ri

        _, rv_f, ri_f = jax.lax.fori_loop(
            0, k_eff, body, (scores, rv_ref[:], ri_ref[:])
        )
        rv_ref[:] = rv_f
        ri_ref[:] = ri_f

    @pl.when(i == n_blocks - 1)
    def _emit():
        vals_out[:] = jnp.where(colk_init < k_eff, rv_ref[:], NEG_INF)
        idx_out[:] = ri_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "k_eff", "block_rows", "interpret", "bias_weight"))
def _dense_topk_pallas(
    emb: jax.Array, queries: jax.Array, n_valid: jax.Array, k: int, k_eff: int,
    block_rows: int, interpret: bool,
    bias: jax.Array | None = None, bias_weight: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    n_pad, d = emb.shape
    b_pad, _ = queries.shape
    grid = (n_pad // block_rows,)
    has_bias = bias is not None
    kernel = functools.partial(_topk_kernel, k=k, k_eff=k_eff, block_rows=block_rows,
                               has_bias=has_bias, bias_weight=bias_weight)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [n_valid, queries, emb]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((b_pad, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM)
        )
        inputs.append(bias)
    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((b_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, k), jnp.float32),
            pltpu.VMEM((b_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=n_pad * d * emb.dtype.itemsize + b_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*inputs)
    return vals, idx


def _bucket_kernel(nvalid_ref, q_ref, e_ref, vals_out, idx_out, wv_ref, wi_ref,
                   *, w: int, tiles: int, transposed: bool):
    """One grid step of the bucketed-winners scan (see bucket_topk).

    Running winners live in VMEM scratch for the whole grid (emitting into
    the revisited output refs directly was measured 1.5x slower — Mosaic
    writes revisited output blocks back to HBM each step). Each grid step
    streams `tiles` corpus sub-tiles through one resident block; with
    `transposed` the corpus block is (D, tiles*W) so the per-tile matmul
    contracts q's lanes against the block's sublanes — the MXU-natural
    orientation, no per-step relayout."""
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    b, _ = wv_ref.shape

    @pl.when(i == 0)
    def _init():
        wv_ref[:] = jnp.full(wv_ref.shape, NEG_INF, jnp.float32)
        wi_ref[:] = jnp.zeros(wi_ref.shape, jnp.int32)

    q = q_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
    nvalid = nvalid_ref[0]

    def tile_body(t, carry):
        wv, wi = carry
        if transposed:
            e = e_ref[:, pl.dslice(t * w, w)]      # (D, W)
            dims = (((1,), (0,)), ((), ()))
        else:
            e = e_ref[pl.dslice(t * w, w), :]      # (W, D)
            dims = (((1,), (1,)), ((), ()))
        s = jax.lax.dot_general(q, e, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)  # (B, W)
        base = (i * tiles + t) * w
        # pad rows exist only in the final tile: skip the mask work elsewhere
        s = jax.lax.cond(
            base + w > nvalid,
            lambda s: jnp.where(base + col < nvalid, s, NEG_INF),
            lambda s: s, s)
        upd = s > wv                  # strict: ties keep the earlier block
        return jnp.maximum(s, wv), jnp.where(upd, base + col, wi)

    wv, wi = jax.lax.fori_loop(0, tiles, tile_body, (wv_ref[:], wi_ref[:]),
                               unroll=True)
    wv_ref[:] = wv
    wi_ref[:] = wi

    @pl.when(i == n_blocks - 1)
    def _emit():
        vals_out[:] = wv_ref[:]
        idx_out[:] = wi_ref[:]


@functools.partial(jax.jit, static_argnames=("w", "tiles", "interpret",
                                             "transposed"))
def _bucket_winners_pallas(emb, queries, n_valid, w: int, tiles: int,
                           interpret: bool, transposed: bool = False):
    if transposed:
        d, n_pad = emb.shape
    else:
        n_pad, d = emb.shape
    b_pad, _ = queries.shape
    rows_per_step = w * tiles
    kernel = functools.partial(_bucket_kernel, w=w, tiles=tiles,
                               transposed=transposed)
    e_spec = (pl.BlockSpec((d, rows_per_step), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
              if transposed else
              pl.BlockSpec((rows_per_step, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(n_pad // rows_per_step,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b_pad, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            e_spec,
        ],
        out_specs=(
            pl.BlockSpec((b_pad, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b_pad, w), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, w), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b_pad, w), jnp.float32),
            pltpu.VMEM((b_pad, w), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d,
            bytes_accessed=n_pad * d * emb.dtype.itemsize + b_pad * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_valid, queries, emb)


@functools.partial(jax.jit, static_argnames=("w",))
def _bucket_winners_xla(emb, queries, n_valid, w: int):
    """XLA oracle for _bucket_winners_pallas: identical bucket semantics
    (strided bucket c -> c mod w, strict-greater update) via lax.scan —
    the parity reference for the compiled Mosaic kernel."""
    n_pad, d = emb.shape
    b = queries.shape[0]

    def body(carry, i):
        wv, wi = carry
        e_blk = jax.lax.dynamic_slice(emb, (i * w, 0), (w, d))
        s = jax.lax.dot_general(
            queries, e_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        base = i * w
        col = jax.lax.broadcasted_iota(jnp.int32, (b, w), 1)
        s = jnp.where(base + col < n_valid[0], s, NEG_INF)
        upd = s > wv
        return (jnp.where(upd, s, wv), jnp.where(upd, base + col, wi)), None

    init = (jnp.full((b, w), NEG_INF, jnp.float32), jnp.zeros((b, w), jnp.int32))
    (wv, wi), _ = jax.lax.scan(body, init, jnp.arange(n_pad // w))
    return wv, wi


def bucket_topk(emb, queries, k: int, w: int = 1024, tiles: int = 1,
                interpret: bool | None = None, use_xla: bool = False,
                transposed: bool = False):
    """Bucketed-winners dense top-k: stream the corpus in (W, D) tiles,
    matmul each tile on the MXU, and keep a (B, W) running elementwise max
    in VMEM (global column c competes in bucket c mod W) — then one exact
    top-k over the W winners. The (B, N) score matrix is never
    materialized; per-block work is pure elementwise select (no K-round
    extract-max merges, the cost that sank the streaming kernel at
    ops/topk.py:40).

    Approximation: two of the true top-k collide in a bucket with
    probability 1/W per pair, so E[recall@k] ~= 1 - (k-1)/(2W); at k=10,
    W=1024 that is ~0.9956 — above the approx_max_k rt=0.95 path this
    replaces. Exact when n <= W (every column gets its own bucket).

    Replaces the reference's FAISS Flat search
    (/root/reference/vector_store/vector_index.py:206-263) at bounded
    memory: HBM traffic is corpus + (B, 2W) instead of corpus + 3x(B, N).
    """
    emb = jnp.asarray(emb)
    queries = jnp.asarray(queries)
    if transposed:
        d, n = emb.shape
    else:
        n, d = emb.shape
    b = queries.shape[0]
    k_eff = min(k, n)
    while w < k_eff:          # winners must be at least k wide
        w *= 2
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    d_pad = _round_up(d, 128)
    b_pad = _round_up(max(b, 8), 8)
    itemsize = jnp.dtype(emb.dtype).itemsize
    # VMEM guard: double-buffered corpus block + resident q + winners
    # (outputs + scratch + fori carry copies) + the f32 score tile must fit
    # ~16MB; shrink tiles first, then the bucket width
    def _vmem(w_, t_):
        return (b_pad * d_pad * itemsize + 7 * b_pad * w_ * 4
                + 2 * t_ * w_ * d_pad * itemsize)
    while tiles > 1 and _vmem(w, tiles) > 12 * 1024 * 1024:
        tiles //= 2
    while w > 128 and w // 2 >= k_eff and _vmem(w, tiles) > 12 * 1024 * 1024:
        w //= 2
    n_pad = _round_up(n, w * tiles)
    if transposed:
        embp = jnp.pad(emb, ((0, d_pad - d), (0, n_pad - n)))
    else:
        embp = jnp.pad(emb, ((0, n_pad - n), (0, d_pad - d)))
    qp = jnp.pad(queries.astype(emb.dtype), ((0, b_pad - b), (0, d_pad - d)))
    n_valid = jnp.array([n], dtype=jnp.int32)
    if use_xla:
        if transposed:
            embp = embp.T
        wv, wi = _bucket_winners_xla(embp, qp, n_valid, w)
    else:
        wv, wi = _bucket_winners_pallas(embp, qp, n_valid, w, tiles, interpret,
                                        transposed=transposed)
    return _bucket_finish(wv, wi, b, k, k_eff)


@functools.partial(jax.jit, static_argnames=("b", "k", "k_eff"))
def _bucket_finish(wv, wi, b: int, k: int, k_eff: int):
    tv, tp = jax.lax.top_k(wv[:b], k_eff)
    ti = jnp.take_along_axis(wi[:b], tp, axis=1)
    ti = jnp.where(tv > NEG_INF / 2, ti, -1)
    return _pad_k(tv, ti, k, k_eff)


@functools.partial(jax.jit, static_argnames=("k", "chunk", "approx", "recall_target"))
def dense_topk_xla(emb: jax.Array, queries: jax.Array, k: int, chunk: int = 65536,
                   approx: bool = False, recall_target: float = 0.95) -> Tuple[jax.Array, jax.Array]:
    """Blockwise matmul + top-k merge (pure XLA): exact fallback/oracle, and —
    with approx=True — the bounded-memory huge-N fast path: per-chunk
    `approx_max_k` (TPU PartialReduce) reduces each (B, chunk) score tile to
    (B, k) before the cross-chunk exact merge, so peak memory is O(B*chunk)
    regardless of N."""
    n, d = emb.shape
    b = queries.shape[0]
    k = min(k, n)
    # keep the matmul in the CORPUS dtype (f32 accumulation): upcasting a
    # bf16 corpus chunk to f32 forces a multi-pass f32 MXU matmul — the
    # 1M-row scan measured ~3x slower through that path
    qf = queries.astype(emb.dtype)

    n_chunks = max(1, -(-n // chunk))
    padded_n = n_chunks * chunk
    embp = jnp.pad(emb, ((0, padded_n - n), (0, 0)))

    def scan_body(carry, blk_idx):
        rv, ri = carry
        e_blk = jax.lax.dynamic_slice(embp, (blk_idx * chunk, 0), (chunk, d))
        s = jnp.dot(qf, e_blk.T, preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, chunk), 1)
        gidx = blk_idx * chunk + col
        s = jnp.where(gidx < n, s, NEG_INF)
        if approx:
            cv, ci = jax.lax.approx_max_k(s, k, recall_target=recall_target)
            cgidx = blk_idx * chunk + ci
        else:
            cv, cgidx = s, gidx
        merged_v = jnp.concatenate([rv, cv], axis=1)
        merged_i = jnp.concatenate([ri, cgidx], axis=1)
        tv, ti = jax.lax.top_k(merged_v, k)
        return (tv, jnp.take_along_axis(merged_i, ti, axis=1)), None

    init = (jnp.full((b, k), NEG_INF), jnp.zeros((b, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(scan_body, init, jnp.arange(n_chunks))
    return vals, idx


def _sort_topk(vals: jax.Array, idx: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    sv, order = jax.lax.top_k(vals, k)
    return sv, jnp.take_along_axis(idx, order, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "bias_weight", "approx", "recall_target"))
def _twopass_topk(emb, queries, k, bias=None, bias_weight: float = 1.0,
                  approx: bool = True, recall_target: float = 0.95):
    """matmul (+ fused bias) -> hardware top-k.

    `approx_max_k` lowers to the TPU PartialReduce op — measured 8x faster
    than lax.top_k at equal batch with recall ~0.98 (rt=0.95) / ~0.99
    (rt=0.99) vs exact.
    """
    scores = jnp.dot(queries, emb.T, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias_weight * bias
    if approx:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)


def dense_topk(
    emb,
    queries,
    k: int,
    *,
    method: str = "auto",
    recall_target: float = 0.95,
    block_rows: int = 1024,
    use_pallas: bool | None = None,
    interpret: bool | None = None,
    bias=None,
    bias_weight: float = 1.0,
):
    """Top-k inner-product search: returns (scores (B,k), indices (B,k)), sorted.

    `emb` may be bf16 (recommended on TPU); accumulation is always f32.
    `bias` (B, N) f32, when given, is fused in: score = q.e + w*bias — the
    hybrid dense+sparse search.

    method:
      auto   — approx two-pass when the (B, N) score matrix fits HBM
               comfortably, else the streaming pallas kernel (TPU) / chunked
               XLA scan (CPU);
      approx — matmul + lax.approx_max_k (TPU PartialReduce; fastest,
               recall set by recall_target);
      exact  — matmul + lax.top_k;
      pallas — the fused streaming kernel: O(N*D) memory, no (B, N) score
               matrix in HBM; EXACT (use when B*N*4 bytes won't fit and
               exactness matters);
      approx_scan — chunked matmul + per-chunk approx_max_k + exact merge:
               bounded O(B*chunk) memory, recall ~= approx; the huge-N
               default;
      scan   — chunked XLA scan + top_k merge (exact, bounded memory, any
               backend).
    `use_pallas=True/False` is honored as a legacy alias for
    method="pallas"/"scan".
    """
    emb = jnp.asarray(emb)
    queries = jnp.asarray(queries)
    n, d = emb.shape
    b = queries.shape[0]
    k_eff = min(k, n)

    on_tpu = jax.default_backend() == "tpu"
    if use_pallas is True:
        method = "pallas"
    elif use_pallas is False:
        method = "scan" if bias is None else "exact_smalln"
    if method == "auto":
        score_bytes = 4 * b * n
        if on_tpu and score_bytes <= 2 * 1024**3:
            method = "approx"
        elif on_tpu:
            # huge-N: bounded-memory chunked approx beats the exact pallas
            # streamer unless bias fusion (hybrid) demands it
            method = "approx_scan" if bias is None else "pallas"
        else:
            method = "scan" if bias is None else "exact_smalln"

    if method in ("approx", "exact"):
        vals, idx = _twopass_topk(
            emb, queries.astype(emb.dtype), k_eff,
            bias=None if bias is None else jnp.asarray(bias, jnp.float32),
            bias_weight=bias_weight, approx=(method == "approx"),
            recall_target=recall_target,
        )
        # approx_max_k returns unsorted-by-score in some configs; sort
        vals, idx = _sort_topk(vals, idx, k_eff)
        return _pad_k(vals, idx, k, k_eff)
    if method in ("scan", "approx_scan"):
        vals, idx = dense_topk_xla(emb, queries, k_eff,
                                   approx=(method == "approx_scan" and on_tpu),
                                   recall_target=recall_target)
        return _pad_k(vals, idx, k, k_eff)
    if method == "exact_smalln":
        scores = jnp.dot(queries.astype(jnp.float32), emb.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32)
        if bias is not None:
            scores = scores + bias_weight * jnp.asarray(bias, jnp.float32)
        vals, idx = jax.lax.top_k(scores, k_eff)
        return _pad_k(vals, idx, k, k_eff)

    # method == "pallas"
    if interpret is None:
        interpret = not on_tpu

    # VMEM budget: double-buffered corpus block + resident queries + f32
    # score tile (and temporaries) + optional double-buffered bias slice
    # must fit in ~16MB of VMEM.
    itemsize = jnp.dtype(emb.dtype).itemsize
    b_pad_est = _round_up(max(b, 8), 8)
    vmem_budget = 10 * 1024 * 1024 - b_pad_est * d * itemsize
    per_row = d * itemsize * 2 + 3 * b_pad_est * 4
    if bias is not None:
        per_row += 2 * b_pad_est * 4
    max_block = max(128, (vmem_budget // per_row) // 128 * 128)
    block_rows = min(block_rows, max_block)
    block_rows = max(128, min(block_rows, _round_up(n, 128)))
    n_pad = _round_up(n, block_rows)
    b_pad = _round_up(max(b, 8), 8)
    k_pad = _round_up(k_eff, 128)
    k_pad = min(k_pad, _round_up(n, 128))

    embp = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
    qp = jnp.pad(queries.astype(emb.dtype), ((0, b_pad - b), (0, 0)))
    n_valid = jnp.array([n], dtype=jnp.int32)
    biasp = None
    if bias is not None:
        biasp = jnp.pad(jnp.asarray(bias, jnp.float32),
                        ((0, b_pad - b), (0, n_pad - n)))

    vals, idx = _dense_topk_pallas(embp, qp, n_valid, k_pad, k_eff, block_rows, interpret,
                                   bias=biasp, bias_weight=bias_weight)
    vals, idx = _sort_topk(vals[:b], idx[:b], k_pad)
    vals, idx = vals[:, :k_eff], idx[:, :k_eff]
    return _pad_k(vals, idx, k, k_eff)


def _pad_k(vals, idx, k, k_eff):
    if k_eff < k:
        pad = ((0, 0), (0, k - k_eff))
        vals = jnp.pad(vals, pad, constant_values=float(NEG_INF))
        idx = jnp.pad(idx, pad, constant_values=-1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "dense_k", "sparse_m",
                                              "sparse_weight", "recall_target", "n_docs",
                                              "materialize_bytes", "max_seg",
                                              "select_approx"))
def hybrid_topk(
    emb: jax.Array,          # (N, D)
    queries: jax.Array,      # (B, D)
    doc_rows: jax.Array,     # (B, L) sorted posting doc ids (gather_plan_sorted)
    weight_rows: jax.Array,  # (B, L) posting weights
    k: int,
    n_docs: int,
    dense_k: int = 128,
    sparse_m: int = 64,
    sparse_weight: float = 0.6,
    recall_target: float = 0.95,
    materialize_bytes: int = 8 * 1024**3,
    max_seg: int = 0,        # max term instances per query (plan builder knows)
    select_approx: bool = False,
):
    """Hybrid v2 top-k via candidate-union fusion — fully scatter-free.

    final = dense + sparse_weight * bm25_max_normalized, evaluated over the
    union of the dense top-dense_k (hardware approx_max_k) and the BM25
    top-sparse_m (sort/cumsum segment sums). This matches the reference's
    fusion semantics — it fuses candidate lists (dense top-k u bm25 top-k,
    query_processor.py:2095-2165), never a full-corpus fused scan — and
    avoids both the (B, N) fused matrix and XLA scatter (measured ~50x
    slower than this path at B=512).

    Returns (fused scores (B, k), doc ids (B, k)) sorted desc; id -1 pads.
    """
    from anorag_tpu.ops.bm25 import (sparse_topm_from_sorted,
                                     sparse_topm_winners)

    # sparse top-m table: feeds the candidate list AND answers "what is the
    # BM25 score of this dense candidate" by equality match. (vmapped
    # searchsorted lookups measured +12ms at B=512 — XLA lowers per-element
    # binary search poorly — and approx_max_k cost grows with k, so a longer
    # lookup table loses too. A dense candidate outside the sparse top-m is
    # scored 0 on the sparse side; the error is bounded by the m-th BM25
    # value and covered docs are in the sparse candidate list anyway.)
    # On TPU the fused winners kernel keeps the (B, L) totals out of HBM.
    # A 3D doc_rows is an L-major tiled plan (bm25.plan_tiles) — the
    # contiguous-DMA layout; always routed to the winners kernel.
    if doc_rows.ndim == 3 or (jax.default_backend() == "tpu"
                              and doc_rows.shape[1] >= 2048):
        # select_approx trades the exact winners-select (lax.top_k over the
        # winners table) for lax.approx_max_k. It is caller-opt-in (default
        # EXACT): r4 silently enabled it on TPU and recall@10 regressed
        # 0.9832 -> 0.9828 despite rt 0.95 -> 0.97 (ADVICE r4 #2).
        sp_vals_all, sp_docs_all, sp_max = sparse_topm_winners(
            doc_rows, weight_rows, sparse_m, n_docs, max_seg=max_seg,
            b_valid=queries.shape[0],
            select_approx=select_approx)
    else:
        _, sp_vals_all, sp_docs_all, sp_max = sparse_topm_from_sorted(
            doc_rows, weight_rows, sparse_m, n_docs)
    return hybrid_fuse(emb, queries, sp_vals_all, sp_docs_all, sp_max, k,
                       n_docs=n_docs, dense_k=dense_k,
                       sparse_weight=sparse_weight,
                       recall_target=recall_target,
                       materialize_bytes=materialize_bytes)


@functools.partial(jax.jit, static_argnames=("k", "dense_k", "sparse_m",
                                              "sparse_weight", "recall_target",
                                              "n_docs", "max_seg", "b_valids"))
def hybrid_topk_bucketed_tiled(
    emb: jax.Array,
    queries: jax.Array,
    plan_arrays,             # tuple of (a3, w3) tiled plans per length bucket
    inv: jax.Array,          # (B,) permutation back to input order
    k: int,
    n_docs: int,
    b_valids,                # tuple of per-bucket true batch sizes
    dense_k: int = 128,
    sparse_m: int = 64,
    sparse_weight: float = 0.6,
    recall_target: float = 0.95,
    max_seg: int = 8,
):
    """hybrid_topk with a length-bucketed sparse stage — ONE dispatch.

    Short-plan queries run the window kernel at their own (pow2) width
    instead of the batch max (bench workload: mean ~10k vs max ~33k posting
    entries). Unlike the round-2 hybrid_topk_bucketed (one dispatch per
    bucket: +28 ms through the tunnel), all buckets live inside this
    single jit. Fusion semantics identical to hybrid_topk (tested equal).

    Measured verdict on the bench workload (200k x 1024, B=512): 5.39 ->
    5.29 ms at groups=2, WORSE at groups=3 — the element savings are eaten
    by back-to-back kernel overheads, so the unbucketed path stays the
    default; this variant pays only for much more skewed plan-length
    distributions."""
    from anorag_tpu.ops.bm25 import sparse_topm_winners_bucketed

    sp_vals, sp_docs, sp_max = sparse_topm_winners_bucketed(
        plan_arrays, inv, sparse_m, n_docs, max_seg, b_valids)
    return hybrid_fuse(emb, queries, sp_vals, sp_docs, sp_max, k,
                       n_docs=n_docs, dense_k=dense_k,
                       sparse_weight=sparse_weight,
                       recall_target=recall_target)


class BucketedSparsePlan(NamedTuple):
    """Device-resident length-bucketed posting plan (make_bucketed_plan)."""
    buckets: tuple          # ((n_valid, dr_dev (Bg, Lg), wr_dev), ...)
    inv: jax.Array          # (B,) device permutation back to input order
    n_rows: int


def make_bucketed_plan(doc_rows, weight_rows, lens, n_docs: int,
                       groups: int = 4) -> BucketedSparsePlan:
    """Host prep for the length-bucketed sparse stage: sort queries by plan
    length, split into `groups` contiguous buckets, pad each to its own
    power-of-two width, and upload each bucket ONCE. The upload is smaller
    than the unbucketed (B, L_max) plan (sum of bucket widths <= global
    max), and reusing the plan across calls costs no further transfers —
    re-uploading slices per call measured 100x the kernel time through the
    tunneled chip.
    """
    import numpy as np

    doc_rows = np.asarray(doc_rows)
    weight_rows = np.asarray(weight_rows)
    b = doc_rows.shape[0]
    groups = max(1, min(groups, b))
    order = np.argsort(np.asarray(lens), kind="stable")
    splits = [s for s in np.array_split(order, groups) if len(s)]
    bg = max(len(s) for s in splits)
    buckets = []
    for rows in splits:
        li = max(int(np.max(np.asarray(lens)[rows])), 1)
        li = max(128, 1 << (li - 1).bit_length())      # pow2, >=128
        li = min(li, doc_rows.shape[1])
        dr = doc_rows[rows, :li]
        wr = weight_rows[rows, :li]
        if len(rows) < bg:                              # pad rows: all-invalid
            pad = bg - len(rows)
            dr = np.concatenate([dr, np.full((pad, li), n_docs, dr.dtype)])
            wr = np.concatenate([wr, np.zeros((pad, li), wr.dtype)])
        buckets.append((len(rows), jnp.asarray(dr), jnp.asarray(wr)))
    inv = np.empty(b, np.int32)
    inv[np.concatenate(splits)] = np.arange(b, dtype=np.int32)
    return BucketedSparsePlan(tuple(buckets), jnp.asarray(inv), b)


def hybrid_topk_bucketed(
    emb: jax.Array,
    queries: jax.Array,
    plan: BucketedSparsePlan,
    k: int,
    n_docs: int,
    dense_k: int = 128,
    sparse_m: int = 64,
    sparse_weight: float = 0.6,
    recall_target: float = 0.95,
    materialize_bytes: int = 8 * 1024**3,
):
    """hybrid_topk with a LENGTH-BUCKETED sparse stage.

    The sparse scan costs O(B * L_max) at the batch-max padded posting
    length; real batches are skewed (bench workload: mean 10.2k, max 32.8k
    — a 3.2x padding waste). make_bucketed_plan splits queries into
    per-length buckets each padded to its own power-of-two width, so scan
    work follows the length distribution instead of the max. The (B, m)
    sparse tables are unsorted back to input order on device before the
    (single, full-batch) dense+fusion stage — identical fusion semantics
    to hybrid_topk (tested equal on CPU).

    Shapes per bucket are (ceil(B/groups), pow2(L_bucket)) — a bounded jit
    set reused across calls at the same batch size. All device work is
    async-dispatched; no host sync between buckets.
    """
    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted

    tvs, tds, mxs = [], [], []
    for n_valid, dr, wr in plan.buckets:
        _, tv, td, mx = sparse_topm_from_sorted(dr, wr, sparse_m, n_docs)
        tvs.append(tv[:n_valid])
        tds.append(td[:n_valid])
        mxs.append(mx[:n_valid])
    sp_vals = jnp.concatenate(tvs, axis=0)[plan.inv]
    sp_docs = jnp.concatenate(tds, axis=0)[plan.inv]
    sp_max = jnp.concatenate(mxs, axis=0)[plan.inv]
    return hybrid_fuse(emb, queries, sp_vals, sp_docs, sp_max,
                       k, n_docs=n_docs, dense_k=dense_k,
                       sparse_weight=sparse_weight,
                       recall_target=recall_target,
                       materialize_bytes=materialize_bytes)


def hybrid_fuse(
    emb: jax.Array,
    queries: jax.Array,
    sp_vals_all: jax.Array,   # (B, M) BM25 top-m values (0 for invalid)
    sp_docs_all: jax.Array,   # (B, M) doc ids (-1 invalid)
    sp_max: jax.Array,        # (B, 1) per-query max BM25
    k: int,
    n_docs: int,
    dense_k: int = 128,
    sparse_weight: float = 0.6,
    recall_target: float = 0.95,
    materialize_bytes: int = 8 * 1024**3,
):
    """Dense candidate generation + candidate-union fusion given the
    sparse top-m tables (the back half of hybrid_topk)."""
    sp_vals = sp_vals_all
    sp_docs = sp_docs_all
    inv_max = jnp.where(sp_max > 0, 1.0 / jnp.maximum(sp_max, 1e-30), 0.0)

    # Dense candidates via hardware approx top-k. The sparse candidates'
    # dense cross-scores come from an embedding-row gather + einsum, NEVER
    # from indexing the score matrix: when approx_max_k is the matmul's
    # only consumer XLA fuses the PartialReduce into the matmul and the
    # (B, N) f32 score matrix never reaches HBM — a take_along_axis on
    # `scores` would force materialization and cost ~1 ms/batch512 at 200k
    # (measured; see scripts/bench_kernel_breakdown.py).
    b = queries.shape[0]
    if 4 * b * n_docs <= materialize_bytes:
        scores = jnp.dot(queries, emb.T, preferred_element_type=jnp.float32)
        d_vals, d_idx = jax.lax.approx_max_k(scores, dense_k, recall_target=recall_target)
    else:
        on_tpu = jax.default_backend() == "tpu"
        d_vals, d_idx = dense_topk_xla(emb, queries, dense_k,
                                       approx=on_tpu, recall_target=recall_target)
    sp_emb = emb[jnp.maximum(sp_docs, 0)]           # (B, M, D)
    sp_dense = jnp.einsum("bmd,bd->bm", sp_emb.astype(jnp.float32),
                          queries.astype(jnp.float32))
    # sparse score of dense candidates: equality match vs the lookup table
    eq = d_idx[:, :, None] == sp_docs_all[:, None, :]          # (B, Kd, Ml)
    d_sparse = jnp.sum(jnp.where(eq, sp_vals_all[:, None, :], 0.0), axis=-1)

    fused_d = d_vals + sparse_weight * d_sparse * inv_max     # (B, Kd)
    fused_s = sp_dense + sparse_weight * sp_vals * inv_max    # (B, M)
    # mask invalid sparse candidates and duplicates already in the dense list
    dup = jnp.any(sp_docs[:, :, None] == d_idx[:, None, :], axis=-1)
    fused_s = jnp.where((sp_docs >= 0) & ~dup, fused_s, NEG_INF)

    all_vals = jnp.concatenate([fused_d, fused_s], axis=1)
    all_ids = jnp.concatenate([d_idx, sp_docs], axis=1)
    tv, tp = jax.lax.top_k(all_vals, k)
    ids = jnp.take_along_axis(all_ids, tp, axis=1)
    ids = jnp.where(tv > NEG_INF / 2, ids, -1)
    return tv, ids


RT_LADDER = (0.95, 0.97, 0.99, 0.998)


def autotune_recall_target(
    search_fn,
    oracle_idx: np.ndarray,
    target: float,
    k: int = 10,
    ladder: Tuple[float, ...] = RT_LADDER,
) -> Tuple[float, float]:
    """Pick the cheapest approx_max_k recall_target meeting `target`.

    The TPU analogue of the reference's nprobe autotune
    (/root/reference/vector_store/vector_index.py:428-470): walk the rt
    ladder on a sampled query batch, measure recall@k against the exact
    oracle, return (rt, measured_recall) for the first rung that clears
    `target` (or the best rung if none does).

    search_fn(rt) -> (B, >=k) candidate doc-id array for the sample batch.
    """
    best = (float(ladder[-1]), -1.0)
    for rt in ladder:
        idx = np.asarray(search_fn(float(rt)))[:, :k]
        rec = float(np.mean([
            len(set(idx[j]) & set(oracle_idx[j, :k])) / k
            for j in range(len(idx))]))
        if rec > best[1]:
            best = (float(rt), rec)
        if rec >= target:
            return float(rt), rec
    return best


def dense_topk_np(emb: np.ndarray, queries: np.ndarray, k: int,
                  chunk: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy exact oracle (FAISS-Flat stand-in for tests/benchmarks).

    Query-chunked: the (B, N) score matrix is built and partitioned one
    chunk at a time — identical output, but the working set stays
    cache-resident (a 10k x 10k all-pairs call dropped 15 s -> ~5 s)."""
    emb32 = emb.astype(np.float32, copy=False)
    q32 = np.atleast_2d(queries).astype(np.float32, copy=False)
    k = min(k, emb.shape[0])
    out_v = np.empty((len(q32), k), np.float32)
    out_i = np.empty((len(q32), k), np.int64)
    for lo in range(0, len(q32), chunk):
        hi = min(lo + chunk, len(q32))
        scores = q32[lo:hi] @ emb32.T
        part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        part_scores = np.take_along_axis(scores, part, axis=1)
        order = np.argsort(-part_scores, axis=1, kind="stable")
        out_v[lo:hi] = np.take_along_axis(part_scores, order, axis=1)
        out_i[lo:hi] = np.take_along_axis(part, order, axis=1)
    return out_v, out_i
