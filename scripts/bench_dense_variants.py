#!/usr/bin/env python
"""On-chip dense-stage variant shootout (VERDICT r3 item 3).

bench_glue_breakdown showed the hybrid glue is ~free (0.14 ms) and the
whole MFU gap lives in the fused matmul+approx_max_k: 4.32 ms pure-device
at (200k x 1024, b=512) vs ~1.1 ms speed-of-light. This times alternative
dense top-k formulations to find where the 3 ms goes:

  A  fused matmul -> approx_max_k (baseline, dense_k=128)
  Ak fused, dense_k = 64 / 32 (PartialReduce cost vs k)
  Ar fused, reduction_input_size_override sweep
  B  chunked approx_scan (dense_topk_xla approx): per-chunk PartialReduce
  C  matmul materialized bf16 + separate approx (fusion broken, cheap HBM)
  D  pure matmul, 128-col output slice (lets XLA drop the epilogue cost;
     lower bound on the matmul alone IF it can dead-code the other cols —
     cross-check vs E)
  E  matmul + cheap tanh-sum epilogue (not algebraically rewritable; the
     honest matmul+VPU-pass floor)

Usage: python scripts/bench_dense_variants.py [n_docs] [batch]
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


def main(n=200_000, b=512, d=1024, dense_k=128, rt=0.95):
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

    out = {"n": n, "b": b, "backend": jax.default_backend(),
           "device": str(jax.devices()[0].device_kind)}
    sol_ms = 2.0 * b * n * d / 197e12 * 1e3
    out["sol_ms_bf16"] = round(sol_ms, 3)

    def emit(kname, val):
        out[kname] = val
        print(json.dumps({kname: val}), flush=True)

    # A: fused baseline at several k
    for kk in (128, 64, 32):
        f = jax.jit(lambda e, qq, kk=kk: chained(
            lambda x: jax.lax.approx_max_k(
                jnp.dot(x, e.T, preferred_element_type=jnp.float32),
                kk, recall_target=rt)[0])(qq))
        emit(f"A_fused_k{kk}", timed_loop(lambda: f(emb, qd)))

    # Ar: reduction_input_size_override — REJECTED by the TPU lowering
    # ('reduction_input_size_override out of range' for values < N); the
    # knob only widens the assumed input, it cannot cheapen the reduce.

    # B: chunked approx_scan over N
    for chunk in (65536, 32768):
        n_pad = (n + chunk - 1) // chunk * chunk
        embp = jnp.pad(emb, ((0, n_pad - n), (0, 0)))
        embr = embp.reshape(n_pad // chunk, chunk, d)

        def scan_approx(e3, qq, chunk=chunk):
            def body(carry, blk):
                bv, bi = carry
                s = jnp.dot(qq, blk.T, preferred_element_type=jnp.float32)
                v, i = jax.lax.approx_max_k(s, dense_k, recall_target=rt)
                av = jnp.concatenate([bv, v], axis=1)
                tv, tp = jax.lax.top_k(av, dense_k)
                return (tv, tp), None
            init = (jnp.full((b, dense_k), -jnp.inf, jnp.float32),
                    jnp.zeros((b, dense_k), jnp.int32))
            (bv, _), _ = jax.lax.scan(body, init, e3)
            return bv
        f = jax.jit(lambda e3, qq: chained(
            lambda x: scan_approx(e3, x))(qq))
        emit(f"B_scan_chunk{chunk}", timed_loop(lambda: f(embr, qd)))
        del embp, embr

    # C: matmul materialized bf16 + separate approx
    def mat_bf16(e, qq):
        s = jnp.dot(qq, e.T, preferred_element_type=jnp.bfloat16)
        s = (s + jnp.bfloat16(0)) * jnp.bfloat16(1)  # keep consumer count >1? no-op
        v, _ = jax.lax.approx_max_k(s.astype(jnp.float32), dense_k,
                                    recall_target=rt)
        return v + s[:, :1].astype(jnp.float32) * 1e-20
    f = jax.jit(lambda e, qq: chained(lambda x: mat_bf16(e, x))(qq))
    emit("C_materialize_bf16", timed_loop(lambda: f(emb, qd)))

    # D: matmul with only 128 output cols kept (XLA may DCE the rest)
    f = jax.jit(lambda e, qq: chained(
        lambda x: jnp.dot(x, e[:128].T,
                          preferred_element_type=jnp.float32)[:, :1])(qq))
    emit("D_matmul_128cols_dce", timed_loop(lambda: f(emb, qd)))

    # E: matmul + tanh-sum epilogue (honest matmul + one VPU pass floor)
    f = jax.jit(lambda e, qq: chained(
        lambda x: jnp.sum(jnp.tanh(
            jnp.dot(x, e.T, preferred_element_type=jnp.float32)),
            axis=1)[:1])(qq))
    emit("E_matmul_tanhsum", timed_loop(lambda: f(emb, qd)))

    for kname in list(out):
        if kname[0] in "ABCDE" and isinstance(out[kname], float):
            out[f"mfu_{kname}"] = round(sol_ms / out[kname], 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(n, b)
