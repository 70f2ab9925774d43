"""Micro-bench: streaming pallas top-k vs approx_max_k on the real TPU.

Timing rule (CLAUDE.md): block_until_ready on the tunneled TPU can return
before work drains — force a value read of a small slice.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.topk import dense_topk, dense_topk_np


def timeit(fn, reps=8):
    v, i = fn()  # compile
    float(v[0, 0])
    # amortize the ~27ms tunnel sync: queue all reps, force one drain at end
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for v, i in outs:
        float(v[0, 0])
    per_call = (time.perf_counter() - t0) / reps
    return per_call, outs[-1]


def main():
    rng = np.random.default_rng(0)
    N, D, B, K = 200_000, 1024, 512, 10
    emb = rng.standard_normal((N, D), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    emb_d = jax.device_put(jnp.asarray(emb, jnp.bfloat16))
    q_d = jax.device_put(jnp.asarray(q, jnp.bfloat16))

    ov, oi = dense_topk_np(emb, q, K)

    for method in ("approx", "pallas", "approx_scan"):
        t, (v, i) = timeit(lambda m=method: dense_topk(emb_d, q_d, K, method=m))
        i_h = np.asarray(i)
        recall = np.mean([len(set(i_h[r]) & set(oi[r])) / K for r in range(B)])
        print(f"{method:8s} {t*1e3:8.2f} ms/batch{B}  recall@{K}={recall:.4f}")


if __name__ == "__main__":
    main()
