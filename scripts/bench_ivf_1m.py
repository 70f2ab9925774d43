"""IVF vs flat at 1M x 1024 on the real TPU — is cluster pruning worth it?

Backlog item (CLAUDE.md): IVF only pays above ~1M rows; measure there.
Timing: queue reps, force a value read at the end (tunnel drains late).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from anorag_tpu.ops.ivf import build_ivf, ivf_search, ivf_probe
from anorag_tpu.ops.topk import dense_topk, dense_topk_np

N, D, B, K = 1_000_000, 1024, 512, 10
NLIST, NPROBES = 1024, (16, 32, 64)


def main():
    rng = np.random.default_rng(0)
    print("generating corpus...", flush=True)
    emb = rng.standard_normal((N, D), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    t0 = time.perf_counter()
    layout, sorted_emb = build_ivf(emb, nlist=NLIST, iters=8, block_rows=1024)
    print(f"build_ivf (kmeans {NLIST} on TPU + host sort): {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    emb_dev = jax.device_put(jnp.asarray(sorted_emb, jnp.bfloat16))
    emb_dev.block_until_ready()
    print(f"device_put 2GB bf16: {time.perf_counter()-t0:.1f}s", flush=True)

    # oracle on a query subset (numpy exact at 1M is ~1 Tflop)
    nsub = 64
    t0 = time.perf_counter()
    _, oracle_idx = dense_topk_np(emb, q[:nsub], K)
    print(f"numpy oracle ({nsub} queries): {time.perf_counter()-t0:.1f}s", flush=True)
    # oracle indices are in ORIGINAL order == sorted order here? No: emb is
    # the original corpus; ivf returns original ids via layout.perm; flat
    # methods search sorted_emb -> map via perm for recall accounting.
    perm = layout.perm

    def recall_from_sorted(idx_sorted):
        got = perm[np.clip(np.asarray(idx_sorted[:nsub]), 0, N - 1)]
        return np.mean([len(set(got[r]) & set(oracle_idx[r])) / K for r in range(nsub)])

    def recall_orig(idx_orig):
        got = np.asarray(idx_orig[:nsub])
        return np.mean([len(set(got[r]) & set(oracle_idx[r])) / K for r in range(nsub)])

    q_dev = jax.device_put(jnp.asarray(q, jnp.bfloat16))

    def timeit(fn, reps=5):
        out = fn()
        jax.block_until_ready(out)
        _ = np.asarray(out[0])[:1, :1]
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        _ = [np.asarray(o[0])[:1, :1] for o in outs]
        return (time.perf_counter() - t0) / reps, out

    for method in ("approx", "approx_scan", "pallas"):
        t, (v, i) = timeit(lambda m=method: dense_topk(emb_dev, q_dev, K, method=m))
        print(f"flat/{method:11s} {t*1e3:8.2f} ms/batch{B}  qps={B/t:8.0f} "
              f"recall@{K}={recall_from_sorted(i):.4f}", flush=True)

    for nprobe in NPROBES:
        t, (v, i) = timeit(lambda np_=nprobe: ivf_search(layout, emb_dev, q, K, nprobe=np_))
        print(f"ivf/nprobe={nprobe:3d}  {t*1e3:8.2f} ms/batch{B}  qps={B/t:8.0f} "
              f"recall@{K}={recall_orig(i):.4f}", flush=True)


if __name__ == "__main__":
    main()
