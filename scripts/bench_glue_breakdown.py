#!/usr/bin/env python
"""On-chip breakdown of hybrid_fuse glue (VERDICT r3 item 3 follow-up).

bench_mfu_attack measured dense 4.35 ms vs dense+glue 5.87 ms pure-device
at (200k, b=512): ~1.5 ms of glue. This isolates which glue stage pays:
the sparse-candidate gather+einsum, the eq-match cross-scoring, or the
final lax.top_k over the (B, dense_k+m) union — and tries cheaper final
selects. Every variant runs chained inside one jit (hoist-proof), with a
forced value read.

Usage: python scripts/bench_glue_breakdown.py [n_docs] [batch]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from anorag_tpu.ops.topk import NEG_INF

LOOP_ITERS = 8


def timed_loop(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return round(1e3 * best / LOOP_ITERS, 3)


def chained(body):
    def run(q):
        def step(_, carry):
            acc, qq = carry
            out = body(qq)
            s = out.astype(jnp.float32).reshape(-1)[0]
            return acc + s, q + (s * 1e-12).astype(q.dtype)
        acc, _ = jax.lax.fori_loop(0, LOOP_ITERS, step,
                                   (jnp.float32(0.0), q))
        return acc
    return run


def main(n=200_000, b=512, d=1024, dense_k=128, m=64, k=100,
         rt=0.95, sw=0.6):
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    key = jax.random.PRNGKey(0)
    emb = jax.random.normal(key, (n, d), jnp.float32)
    emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(dtype)
    emb = jax.block_until_ready(emb)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qd = jax.device_put(jnp.asarray(q, dtype))
    # realistic (non-degenerate) sparse tables: random doc ids + values
    sp_docs = jnp.asarray(rng.integers(0, n, (b, m)), jnp.int32)
    sp_vals = jnp.asarray(rng.random((b, m)), jnp.float32)
    sp_max = jnp.max(sp_vals, axis=1, keepdims=True)

    out = {"n": n, "b": b, "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind)}

    def emit(kname, val):
        out[kname] = val
        print(json.dumps({kname: val}), flush=True)

    def mm_approx(e, qq):
        s = jnp.dot(qq, e.T, preferred_element_type=jnp.float32)
        return jax.lax.approx_max_k(s, dense_k, recall_target=rt)

    # A) dense only
    fA = jax.jit(lambda e, qq: chained(
        lambda x: mm_approx(e, x)[0])(qq))
    emit("A_dense_only", timed_loop(lambda: fA(emb, qd)))

    # B) dense + sparse-candidate gather+einsum
    def fuseB(e, qq):
        d_vals, _ = mm_approx(e, qq)
        sp_emb = e[jnp.maximum(sp_docs, 0)]
        sp_dense = jnp.einsum("bmd,bd->bm", sp_emb.astype(jnp.float32),
                              qq.astype(jnp.float32))
        return d_vals[:, :1] + sp_dense[:, :1]
    fB = jax.jit(lambda e, qq: chained(lambda x: fuseB(e, x))(qq))
    emit("B_plus_gather_einsum", timed_loop(lambda: fB(emb, qd)))

    # C) everything except the final top_k
    def fuseC(e, qq):
        d_vals, d_idx = mm_approx(e, qq)
        sp_emb = e[jnp.maximum(sp_docs, 0)]
        sp_dense = jnp.einsum("bmd,bd->bm", sp_emb.astype(jnp.float32),
                              qq.astype(jnp.float32))
        inv_max = jnp.where(sp_max > 0, 1.0 / jnp.maximum(sp_max, 1e-30), 0.0)
        eq = d_idx[:, :, None] == sp_docs[:, None, :]
        d_sparse = jnp.sum(jnp.where(eq, sp_vals[:, None, :], 0.0), axis=-1)
        fused_d = d_vals + sw * d_sparse * inv_max
        fused_s = sp_dense + sw * sp_vals * inv_max
        dup = jnp.any(sp_docs[:, :, None] == d_idx[:, None, :], axis=-1)
        fused_s = jnp.where((sp_docs >= 0) & ~dup, fused_s, NEG_INF)
        return jnp.concatenate([fused_d, fused_s], axis=1)
    fC = jax.jit(lambda e, qq: chained(
        lambda x: fuseC(e, x)[:, :1])(qq))
    emit("C_all_but_final_topk", timed_loop(lambda: fC(emb, qd)))

    # D) full glue, final lax.top_k
    def fuseD(e, qq):
        av = fuseC(e, qq)
        tv, _ = jax.lax.top_k(av, k)
        return tv
    fD = jax.jit(lambda e, qq: chained(lambda x: fuseD(e, x))(qq))
    emit("D_full_topk", timed_loop(lambda: fD(emb, qd)))

    # E) full glue, final = descending sort slice
    def fuseE(e, qq):
        av = fuseC(e, qq)
        return jax.lax.sort(av, dimension=1)[:, -k:]
    fE = jax.jit(lambda e, qq: chained(lambda x: fuseE(e, x))(qq))
    emit("E_full_sortslice", timed_loop(lambda: fE(emb, qd)))

    # F) raw matmul + full materialize + top_k dense (the anti-pattern,
    #    for scale)
    def fuseF(e, qq):
        s = jnp.dot(qq, e.T, preferred_element_type=jnp.float32)
        v, _ = jax.lax.approx_max_k(s, dense_k, recall_target=rt)
        return v + jnp.sum(s[:, :1]) * 1e-20   # second consumer: breaks fusion
    fF = jax.jit(lambda e, qq: chained(lambda x: fuseF(e, x))(qq))
    emit("F_dense_fusion_broken", timed_loop(lambda: fF(emb, qd)))

    dense_flops = 2.0 * b * n * d
    for kname in ("A_dense_only", "D_full_topk"):
        out[f"mfu_{kname}"] = round(
            dense_flops / (out[kname] * 1e-3) / 197e12, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(n, b)
