#!/usr/bin/env python
"""Separate per-dispatch overhead from per-iteration compute on the
tunneled TPU (follow-up to bench_dense_variants: a TINY matmul chained in
a fori_loop read 3.35 ms/iter — implausible unless a fixed cost is being
divided by LOOP_ITERS).

Times, for LOOP_ITERS in {1, 8, 32}:
  tiny  — chained 128-col matmul (big corpus array PRESENT as an unused
          jit arg)
  dense — chained full matmul+approx_max_k
and a trivial fn with/without the 410 MB array as an arg.

Linear fit time(iters) = fixed + iters * per_iter gives the honest
per-iteration device cost of the dense stage.

Usage: python scripts/bench_dispatch_anatomy.py [n_docs] [batch]
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


def timed(fn, reps=6):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    return round(1e3 * best, 3)


def chained(body, iters):
    def run(q):
        def step(_, carry):
            acc, qq = carry
            out = body(qq)
            s = out.astype(jnp.float32).reshape(-1)[0]
            return acc + s, q + (s * 1e-12).astype(q.dtype)
        acc, _ = jax.lax.fori_loop(0, iters, step,
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
           "device": str(jax.devices()[0].device_kind),
           "sol_ms_bf16": round(2.0 * b * n * d / 197e12 * 1e3, 3)}

    def emit(kname, val):
        out[kname] = val
        print(json.dumps({kname: val}), flush=True)

    # 0) trivial fn, no big arg vs big arg
    f0 = jax.jit(lambda qq: (qq @ qq.T)[0, 0])
    emit("trivial_small_arg_ms", timed(lambda: f0(qd)))
    f1 = jax.jit(lambda e, qq: (qq @ qq.T)[0, 0] + e[0, 0].astype(jnp.float32) * 0)
    emit("trivial_big_arg_ms", timed(lambda: f1(emb, qd)))

    # 1) tiny matmul chained, big arg present
    for iters in (1, 8, 32):
        f = jax.jit(lambda e, qq, it=iters: chained(
            lambda x: jnp.dot(x, e[:128].T,
                              preferred_element_type=jnp.float32)[:, :1],
            it)(qq))
        emit(f"tiny_iters{iters}_total_ms", timed(lambda: f(emb, qd)))

    # 2) dense matmul+approx chained
    dt = {}
    for iters in (1, 8, 32):
        f = jax.jit(lambda e, qq, it=iters: chained(
            lambda x: jax.lax.approx_max_k(
                jnp.dot(x, e.T, preferred_element_type=jnp.float32),
                dense_k, recall_target=rt)[0],
            it)(qq))
        dt[iters] = timed(lambda: f(emb, qd))
        emit(f"dense_iters{iters}_total_ms", dt[iters])

    per_iter = (dt[32] - dt[8]) / 24.0
    fixed = dt[8] - 8 * per_iter
    emit("dense_per_iter_ms", round(per_iter, 3))
    emit("dense_fixed_ms", round(fixed, 3))
    emit("dense_per_iter_mfu", round(out["sol_ms_bf16"] / max(per_iter, 1e-9), 4))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    main(n, b)
