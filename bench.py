#!/usr/bin/env python
"""Benchmark: hybrid-query (dense + BM25, v2 fusion) QPS per chip + MFU,
plus the encoder forward pass (tokens/s, MFU) and e2e encode->search QPS.

The headline workload from BASELINE.md: over an atomic-notes corpus
(N x 1024, MuSiQue-scale vocabulary), answer query batches with
  final = 1.0 * dense_cosine + 0.6 * bm25_max_normalized, top-k
on TPU — dense via the fused matmul+approx_max_k two-pass (XLA fuses the
PartialReduce into the matmul: the (B, N) f32 score matrix never reaches
HBM), BM25 via the fused segment+winners Pallas kernel. Two scale points:

  * 200k docs — with the exact-f32 CPU baseline (numpy brute force, the
    FAISS-Flat-CPU stand-in; FAISS is not installed) and recall@10 over
    the full batch;
  * 1M docs  — device-resident corpus (generated on-chip: >1GB host
    device_puts crawl through the tunnel), recall@10 vs an f32
    HIGHEST-precision device oracle on a 64-query subset.

Before timing, compiled-Mosaic parity is asserted on-chip (kernel_parity):
the CPU-forced pytest suite never exactness-tests the compiled kernels, so
this is the gate that catches Mosaic regressions (runs every round).

MFU accounting: achieved_tflops counts only the dense matmul flops
(2*B*N*D) over the full hybrid latency — sparse scoring, fusion, and
dispatch overhead all discount it, so mfu is an end-to-end number, not a
kernel-best number. Peak is per device_kind (v5 lite: 197 bf16 TF/s).

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time
from pathlib import Path

import numpy as np

# approx_max_k recall_target for the headline hybrid path; the gate below
# pins >= RECALL_GATE so any future speed-for-recall trade fails loud
# (VERDICT r3 weak #3). Overridable for on-chip operating-point sweeps. If
# the measured recall misses the gate at RECALL_TARGET, main() autotunes up
# the rt ladder (the reference autotunes nprobe the same way,
# /root/reference/vector_store/vector_index.py:428-470) instead of dying
# before printing its JSON line (ADVICE r4 #1).
#
# Operating point (measured on-chip, round 5, scripts in /tmp lineage ->
# PROGRESS notes): the 200k recall@10 is capped by the SPARSE candidate
# depth, not by approx_max_k — recall was bit-identical at rt 0.97/0.99/
# 0.998 (0.9832) while QPS collapsed 88k->6.4k, and dense_k 128->256 moved
# nothing. sparse_m 64->128 lifts 0.9832->0.9898 at ~15% QPS cost, so the
# headline runs m=128 with the cheap rt=0.95 and the approx winners-select
# (parity-covered in kernel_parity).
RECALL_TARGET = float(os.environ.get("ANORAG_BENCH_RT", "0.95"))
RECALL_GATE = 0.985
SPARSE_M = int(os.environ.get("ANORAG_BENCH_SPARSE_M", "128"))
RT_LADDER = (0.97, 0.99)


def peak_tflops(device_kind: str) -> float:
    kind = device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return 197e12
    if "v5p" in kind or "v5" in kind:
        return 459e12
    if "v4" in kind:
        return 275e12
    if "v6" in kind or "trillium" in kind:
        return 918e12
    return 197e12


def make_doc_terms(n_docs: int, vocab: int, doc_len: int, rng) -> np.ndarray:
    """Zipf-ish term matrix (N, L) — one vectorized draw, not a per-doc loop."""
    p = 1.0 / np.arange(1, vocab + 1)
    p /= p.sum()
    return rng.choice(vocab, size=(n_docs, doc_len), p=p).astype(np.int32)


def make_query_terms(b: int, vocab: int, q_len: int, rng, min_rank: int = 100):
    """Query terms sample the content-word band (rank >= min_rank): real
    queries are dominated by content words, not the stopword head of the
    Zipf curve (whose postings would be ~the whole corpus)."""
    ranks = np.arange(min_rank, vocab)
    p = 1.0 / (ranks + 1.0)
    p /= p.sum()
    return [rng.choice(ranks, size=q_len, p=p).tolist() for _ in range(b)]


def kernel_parity() -> dict:
    """Compiled-kernel exactness ON the current backend, asserted before any
    timing. Covers the two Pallas kernels in the hybrid path against their
    XLA oracles; raises on mismatch (failing the whole bench run)."""
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.bm25 import sparse_topm_from_sorted, sparse_topm_winners
    from anorag_tpu.ops.topk import bucket_topk

    rng = np.random.default_rng(7)
    # bucket_topk: compiled pallas vs XLA-scan oracle, exact equality
    emb = rng.standard_normal((3000, 256)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((16, 256)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    embd, qd = jnp.asarray(emb), jnp.asarray(q)
    v1, i1 = bucket_topk(embd, qd, 10, w=512, interpret=False)
    v2, i2 = bucket_topk(embd, qd, 10, w=512, use_xla=True)
    assert np.array_equal(np.asarray(i1), np.asarray(i2)), "bucket_topk Mosaic != XLA"
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)

    # segment winners kernel: scores of shared docs must match the exact
    # XLA segment chain bit-tolerant; winner doc set within collision class
    n_docs, b, l = 4000, 8, 4096
    rows, ws = [], []
    for _ in range(b):
        nv = int(rng.integers(l // 2, l))
        ids = np.sort(rng.integers(0, n_docs, nv))
        ids = np.concatenate([ids, np.full(l - nv, n_docs)]).astype(np.int32)
        rows.append(ids)
    a = np.stack(rows)
    w = np.where(a < n_docs, rng.random((b, l)).astype(np.float32) + 0.01, 0.0)
    ad, wd = jnp.asarray(a), jnp.asarray(w)
    _, tv, td, mx = sparse_topm_from_sorted(ad, wd, 16, n_docs, impl="xla")

    def _winner_check(tv2, td2, mx2, name):
        np.testing.assert_allclose(np.asarray(mx2), np.asarray(mx), rtol=1e-4,
                                   err_msg=f"{name} mx mismatch")
        tvh, tdh, tv2h, td2h = map(np.asarray, (tv, td, tv2, td2))
        recs = []
        for bi in range(b):
            gold = {d: v for d, v in zip(tdh[bi], tvh[bi]) if d >= 0}
            got = {d: v for d, v in zip(td2h[bi], tv2h[bi]) if d >= 0}
            shared = set(gold) & set(got)
            recs.append(len(shared) / max(len(gold), 1))
            for d in shared:
                np.testing.assert_allclose(got[d], gold[d], rtol=1e-4,
                                           err_msg=f"{name} score mismatch")
        rec = float(np.mean(recs))
        assert rec >= 0.9, f"{name} recall vs oracle too low: {rec}"
        return round(rec, 4)

    rec_scan = _winner_check(*sparse_topm_winners(ad, wd, 16, n_docs),
                             "segment_winners")
    # window kernel needs the true max duplicate-run length of the rows
    max_run = 1
    for bi in range(b):
        row = a[bi][a[bi] < n_docs]
        if len(row):
            _, counts = np.unique(row, return_counts=True)
            max_run = max(max_run, int(counts.max()))
    rec_win = _winner_check(
        *sparse_topm_winners(ad, wd, 16, n_docs, max_seg=min(max_run, 32)),
        "window_winners")
    # approx winners-select (opt-in path, ADVICE r4 #2): pinned recall bound
    # so enabling it anywhere has compiled coverage, not just the e2e gate
    rec_approx = _winner_check(
        *sparse_topm_winners(ad, wd, 16, n_docs, select_approx=True),
        "winners_select_approx")
    return {"bucket_topk": "exact", "segment_winners": rec_scan,
            "window_winners": rec_win,
            "winners_select_approx": rec_approx,
            "backend": jax.default_backend()}


def bench_hybrid(n_docs: int, b: int = 512, dim: int = 1024, vocab: int = 30_000,
                 doc_len: int = 40, q_len: int = 8, k: int = 100,
                 topk_eval: int = 10, rounds: int = 20,
                 cpu_baseline: bool = True, oracle_queries: int = 0,
                 seed: int = 0, keep_ctx: bool = False,
                 recall_target: float | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.bm25 import (build_postings, gather_plan,
                                     gather_plan_sorted, plan_tiles)
    from anorag_tpu.ops.topk import hybrid_topk

    on_tpu = jax.default_backend() == "tpu"
    rt = RECALL_TARGET if recall_target is None else recall_target
    rng = np.random.default_rng(seed)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    # corpus embeddings: generated on-device (unit rows); host copy only
    # when the CPU baseline needs it
    key = jax.random.PRNGKey(seed)
    emb_dev = jax.random.normal(key, (n_docs, dim), jnp.float32)
    emb_dev = emb_dev / jnp.linalg.norm(emb_dev, axis=1, keepdims=True)
    emb_host = np.asarray(emb_dev) if cpu_baseline else None
    emb_dev = emb_dev.astype(dtype)

    doc_terms = make_doc_terms(n_docs, vocab, doc_len, rng)
    postings = build_postings([r.tolist() for r in doc_terms], vocab)
    q = rng.standard_normal((b, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q_terms = make_query_terms(b, vocab, q_len, rng)

    doc_rows, weight_rows, _ = gather_plan_sorted(postings, q_terms)
    if on_tpu:
        # L-major tiled layout: contiguous kernel DMAs (plan_tiles docstring)
        doc_rows, weight_rows = plan_tiles(doc_rows, weight_rows, n_docs)
    dr_dev = jax.device_put(jnp.asarray(doc_rows))
    wr_dev = jax.device_put(jnp.asarray(weight_rows))
    q_dev = jax.device_put(jnp.asarray(q, dtype))

    def hybrid_dev():
        return hybrid_topk(emb_dev, q_dev, dr_dev, wr_dev, k, n_docs=n_docs,
                           dense_k=128, sparse_m=SPARSE_M,
                           sparse_weight=0.6, recall_target=rt,
                           max_seg=q_len, select_approx=True)

    # warm up / compile. NOTE: timing forces a value read — on tunneled
    # devices block_until_ready can return before the work drains. Device
    # timing is best-of-3 round blocks: the tunnel's round-trip latency
    # varies 2x run-to-run and would otherwise understate the chip.
    v, i = hybrid_dev()
    _ = float(np.asarray(v[0, 0]))
    best_dt_dev = float("inf")
    # tunnel round-trip latency varies ~2x run-to-run: more best-of blocks
    # at large corpora where a single slow block would distort MFU
    blocks = 3 if n_docs <= 500_000 else 5
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(rounds):
            v, i = hybrid_dev()
        _ = float(np.asarray(v[0, 0]))
        best_dt_dev = min(best_dt_dev, time.perf_counter() - t0)
    qps = b * rounds / best_dt_dev
    our_idx = np.asarray(i)[:, :topk_eval]

    def sparse_cpu(rows_plan, nq):
        s = np.zeros((nq, n_docs), np.float32)
        for bi in range(nq):
            rows = rows_plan[bi]
            rows = rows[rows >= 0]
            s[bi] = np.bincount(postings.doc_ids[rows],
                                weights=postings.weights[rows],
                                minlength=n_docs).astype(np.float32)
        mx = s.max(axis=1, keepdims=True)
        return np.where(mx > 0, s / np.maximum(mx, 1e-30), 0.0)

    gi, _ = gather_plan(postings, q_terms)

    lat_s = best_dt_dev / rounds
    dense_flops = 2.0 * b * n_docs * dim
    peak = peak_tflops(jax.devices()[0].device_kind) if on_tpu else 1e12
    out = {
        "n_docs": n_docs, "batch": b,
        "recall_target": rt,
        "qps": round(qps, 1),
        "latency_ms_per_batch": round(1000.0 * lat_s, 2),
        "achieved_tflops": round(dense_flops / lat_s / 1e12, 1),
        "mfu": round(dense_flops / lat_s / peak, 4),
    }

    if cpu_baseline:
        sparse_norm = sparse_cpu(gi, b)

        def hybrid_cpu():
            scores = q @ emb_host.T + 0.6 * sparse_norm
            part = np.argpartition(-scores, k - 1, axis=1)[:, :k]
            ps = np.take_along_axis(scores, part, axis=1)
            order = np.argsort(-ps, axis=1)
            return np.take_along_axis(ps, order, 1), np.take_along_axis(part, order, 1)

        hybrid_cpu()  # warm caches
        best_dt = float("inf")
        for _ in range(3):  # best-of-3: shields the baseline from host contention
            t0 = time.perf_counter()
            cpu_vals, cpu_idx = hybrid_cpu()
            best_dt = min(best_dt, time.perf_counter() - t0)
        out["cpu_baseline_qps"] = round(b / best_dt, 1)
        out["vs_baseline"] = round(qps * best_dt / b, 2)
        exact_idx = cpu_idx[:, :topk_eval]
        out["recall_at_10_vs_exact_f32"] = round(float(np.mean([
            len(set(our_idx[j]) & set(exact_idx[j])) / topk_eval for j in range(b)
        ])), 4)
    elif oracle_queries:
        # device f32 oracle (HIGHEST precision: TPU f32 matmuls default to
        # bf16 passes) on a query subset
        nq = min(oracle_queries, b)
        sparse_sub = sparse_cpu(gi[:nq], nq)
        qo = jnp.asarray(q[:nq])
        so = jax.device_put(jnp.asarray(sparse_sub))
        scores = jnp.dot(qo, emb_dev.astype(jnp.float32).T,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32) + 0.6 * so
        _, oracle_i = jax.lax.top_k(scores, topk_eval)
        oracle_i = np.asarray(oracle_i)
        out["recall_at_10_vs_exact_f32"] = round(float(np.mean([
            len(set(our_idx[j]) & set(oracle_i[j])) / topk_eval for j in range(nq)
        ])), 4)
        out["recall_oracle_queries"] = nq
    if keep_ctx:
        out["_ctx"] = {"emb_dev": emb_dev, "dr_dev": dr_dev, "wr_dev": wr_dev,
                       "k": k, "n_docs": n_docs, "batch": b,
                       "q_dev": q_dev, "max_seg": q_len}
    return out


def bench_true_device(ctx: dict, recall_target: float,
                      iters=(2, 10)) -> dict:
    """Tunnel-free per-step latency of the FULL hybrid step via a chained
    fori_loop: run the step `iters` times inside ONE dispatch (each
    iteration's output perturbs the next query so XLA can't hoist it), then
    linear-fit total time vs iters — the slope is the true on-device step
    time with host/tunnel round-trip (22-30 ms here) subtracted out.
    Methodology from scripts/bench_dispatch_anatomy.py (r4 probes: dense
    kernel alone measured 73% MFU true-device vs 0.20 tunnel-inclusive)."""
    import jax
    import jax.numpy as jnp

    from anorag_tpu.ops.topk import hybrid_topk

    emb, q0 = ctx["emb_dev"], ctx["q_dev"]
    dr, wr = ctx["dr_dev"], ctx["wr_dev"]
    n_docs, b, k = ctx["n_docs"], ctx["batch"], ctx["k"]
    max_seg = ctx["max_seg"]

    def chained(it):
        @jax.jit
        def run(e, q):
            def step(_, carry):
                acc, qq = carry
                tv, _ = hybrid_topk(e, qq, dr, wr, k, n_docs=n_docs,
                                    dense_k=128, sparse_m=SPARSE_M,
                                    sparse_weight=0.6,
                                    recall_target=recall_target,
                                    max_seg=max_seg, select_approx=True)
                s = tv[0, 0].astype(jnp.float32)
                return acc + s, qq + (s * 1e-12).astype(qq.dtype)
            acc, _ = jax.lax.fori_loop(0, it, step, (jnp.float32(0.0), q))
            return acc
        return run

    totals = {}
    for it in iters:
        f = chained(it)
        _ = float(np.asarray(f(emb, q0)))          # compile + warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(emb, q0)))      # value read = drain
            best = min(best, time.perf_counter() - t0)
        totals[it] = best
    per_iter = (totals[iters[1]] - totals[iters[0]]) / (iters[1] - iters[0])
    per_iter = max(per_iter, 1e-9)
    dim = emb.shape[1]
    dense_flops = 2.0 * b * n_docs * dim
    on_tpu = jax.default_backend() == "tpu"
    peak = peak_tflops(jax.devices()[0].device_kind) if on_tpu else 1e12
    return {
        "latency_ms_true_device": round(1e3 * per_iter, 3),
        "qps_true_device": round(b / per_iter, 1),
        "mfu_true_device": round(dense_flops / per_iter / peak, 4),
        "chain_iters": list(iters),
        "chain_totals_ms": {str(i): round(1e3 * t, 2)
                            for i, t in totals.items()},
    }


def bench_encoder(ctx: dict | None, b: int = 256, seq: int = 128,
                  q_seq: int = 64, rounds: int = 5) -> dict:
    """The north-star hot loop #2: the sharded JAX embedding forward pass
    (ref /root/reference/vector_store/embedding_manager.py:374-407 encodes
    with bge-m3). Weights are random-init ON DEVICE (no pretrained
    checkpoint is obtainable in-image; random weights are
    compute-identical) at the bge-m3-class config: 24L/1024h/16heads/4096i,
    XLM-R vocab. Reports tokens/s + encoder MFU, and — when a hybrid ctx
    is given — e2e encode->hybrid-search QPS at query length q_seq."""
    import jax
    import jax.numpy as jnp

    from anorag_tpu.models.encoder import EncoderConfig, encode, init_params
    from anorag_tpu.ops.topk import hybrid_topk

    on_tpu = jax.default_backend() == "tpu"
    cfg = EncoderConfig(max_position=max(seq, q_seq))
    # prefer the in-image TRAINED full-config checkpoint (VERDICT r3 #5:
    # bench trained weights, not random-init). Compute is identical; the
    # label records which one this run measured.
    ckpt = Path(__file__).parent / "checkpoints" / "encoder_synth_full"
    params = None
    label = "bge-m3-class 24L/1024h (random-init, in-image)"
    if ckpt.exists():
        try:
            import orbax.checkpoint as ocp
            report = {}
            rp = ckpt.parent / "encoder_synth_full_report.json"
            if rp.exists():
                report = json.loads(rp.read_text())
            tcfg = report.get("config", {})
            if (tcfg.get("hidden") == cfg.hidden_size
                    and tcfg.get("layers") == cfg.num_layers):
                # the compute dims (24L/1024h/ffn) are the bge-m3-class
                # geometry; vocab/pooling come from the in-image trained
                # checkpoint (hash tokenizer — no sentencepiece in image).
                cfg = EncoderConfig(
                    vocab_size=tcfg.get("vocab", cfg.vocab_size),
                    hidden_size=cfg.hidden_size, num_layers=cfg.num_layers,
                    num_heads=tcfg.get("heads", cfg.num_heads),
                    intermediate_size=tcfg.get("ffn", cfg.intermediate_size),
                    max_position=cfg.max_position,
                    pooling=tcfg.get("pooling", cfg.pooling))
                abstract = jax.eval_shape(
                    lambda key: init_params(key, cfg), jax.random.PRNGKey(0))
                params = ocp.StandardCheckpointer().restore(
                    ckpt.resolve(), abstract)
                params = jax.device_put(params)
                label = (f"bge-m3-class 24L/1024h (TRAINED in-image, "
                         f"step {report.get('steps', '?')}, "
                         f"loss {report.get('loss_last', '?')}, "
                         f"vocab {cfg.vocab_size} hash-tok)")
        except Exception as e:
            print(f"# encoder checkpoint load failed ({e}); random-init",
                  flush=True)
            params = None
    if params is None:
        params = jax.jit(lambda key: init_params(key, cfg))(
            jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    enc = jax.jit(lambda p, ids, m: encode(p, ids, m, cfg))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (b, seq)), jnp.int32)
    mask = jnp.ones((b, seq), jnp.int32)

    out = enc(params, ids, mask)
    _ = float(np.asarray(out[0, 0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(rounds):
            out = enc(params, ids, mask)
        _ = float(np.asarray(out[0, 0]))
        best = min(best, time.perf_counter() - t0)
    lat = best / rounds
    tokens = b * seq
    h, i_sz, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    flops_tok = L * (2 * (4 * h * h + 2 * h * i_sz) + 4 * seq * h)
    flops = tokens * flops_tok
    peak = peak_tflops(jax.devices()[0].device_kind) if on_tpu else 1e12
    res = {
        "config": label,
        "batch": b, "seq_len": seq,
        "tokens_per_s": round(tokens / lat, 1),
        "latency_ms_per_batch": round(lat * 1e3, 2),
        "achieved_tflops": round(flops / lat / 1e12, 1),
        "mfu": round(flops / lat / peak, 4),
    }

    if ctx is not None:
        emb_dev, dr, wr = ctx["emb_dev"], ctx["dr_dev"], ctx["wr_dev"]
        n_docs, k = ctx["n_docs"], ctx["k"]
        eb = ctx["batch"]  # batch must match the sparse plan's
        q_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (eb, q_seq)), jnp.int32)
        q_mask = jnp.ones((eb, q_seq), jnp.int32)

        def e2e():
            qv = enc(params, q_ids, q_mask).astype(emb_dev.dtype)
            return hybrid_topk(emb_dev, qv, dr, wr, k, n_docs=n_docs,
                               dense_k=128, sparse_m=SPARSE_M,
                               sparse_weight=0.6,
                               recall_target=RECALL_TARGET, max_seg=8,
                               select_approx=True)

        v, _ = e2e()
        _ = float(np.asarray(v[0, 0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(rounds):
                v, _ = e2e()
            _ = float(np.asarray(v[0, 0]))
            best = min(best, time.perf_counter() - t0)
        res["e2e_encode_search_qps"] = round(eb * rounds / best, 1)
        res["e2e_query_seq_len"] = q_seq
    return res


def _scale_1m() -> dict:
    return bench_hybrid(1_000_000, cpu_baseline=False, oracle_queries=64,
                        rounds=10, seed=1)


def main() -> int:
    import subprocess
    import sys

    import jax

    if "--probe-only" in sys.argv:
        import jax.numpy as jnp
        x = jnp.ones((128, 128), jnp.float32)
        v = float((x @ x)[0, 0])          # value read: forces real drain
        print(json.dumps({"probe": "ok", "v": v,
                          "backend": jax.default_backend()}))
        return 0

    if "--scale-1m-only" in sys.argv:
        print(json.dumps(_scale_1m()))
        return 0

    # The tunneled device can die outright (observed: trivial ops hang
    # >120s, remote_compile HTTP 500). A hung jit blocks forever with no
    # Python-level timeout, so probe in a SUBPROCESS first and fail with
    # an honest one-line JSON instead of hanging the driver's bench run.
    try:
        subprocess.run([sys.executable, __file__, "--probe-only"],
                       capture_output=True, text=True, timeout=420,
                       check=True)
    except Exception as e:
        print(json.dumps({
            "metric": "hybrid_query_qps_per_chip", "value": None,
            "unit": "queries/s", "vs_baseline": None,
            "error": "device unreachable: tiny-op probe failed "
                     f"({type(e).__name__}); tunnel likely down"}))
        return 1

    # The 1M point runs FIRST, in its own process, so the large corpus
    # gets a clean device: when it shares the chip with the 200k+encoder
    # phases' resident HBM it has measured up to +2.7 ms worse. (Tunnel
    # latency itself varies ~2x run-to-run, so isolation removes one
    # variance source rather than guaranteeing the best-case number.)
    # The child exits and frees everything before the phases below
    # allocate.
    try:
        proc = subprocess.run(
            [sys.executable, __file__, "--scale-1m-only"],
            capture_output=True, text=True, timeout=1800, check=True)
        scale_1m = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception:
        scale_1m = None           # fallback: measure in-process at the end

    parity = kernel_parity()

    # recall gate + autotune — the fused path must not silently trade
    # recall@10 for QPS (r2 0.9871 -> r3 0.9832 went unflagged). If the
    # default rt misses the gate, walk the rt ladder up (the reference
    # autotunes nprobe to a recall target the same way,
    # /root/reference/vector_store/vector_index.py:428-470). Whatever
    # happens, the ONE JSON line is printed (ADVICE r4 #1): a gate failure
    # becomes a field + rc 1, never an assert before output.
    autotune_history = []
    headline = bench_hybrid(200_000, cpu_baseline=True, keep_ctx=True)
    autotune_history.append({"rt": headline["recall_target"],
                             "recall": headline["recall_at_10_vs_exact_f32"],
                             "qps": headline["qps"]})
    for rt_next in RT_LADDER:
        if headline["recall_at_10_vs_exact_f32"] >= RECALL_GATE:
            break
        if rt_next <= headline["recall_target"]:
            continue
        headline = bench_hybrid(200_000, cpu_baseline=True, keep_ctx=True,
                                recall_target=rt_next)
        autotune_history.append(
            {"rt": rt_next,
             "recall": headline["recall_at_10_vs_exact_f32"],
             "qps": headline["qps"]})
    rec = headline["recall_at_10_vs_exact_f32"]
    gate_ok = rec >= RECALL_GATE
    rt_used = headline["recall_target"]

    ctx = headline.pop("_ctx")
    true_dev = None
    try:
        true_dev = bench_true_device(ctx, rt_used)
    except Exception as e:          # never let the new probe kill the line
        true_dev = {"error": f"{type(e).__name__}: {e}"}
    encoder = bench_encoder(ctx)
    del ctx
    if scale_1m is None:
        scale_1m = _scale_1m()

    on_tpu = jax.default_backend() == "tpu"
    out = {
        "metric": "hybrid_query_qps_per_chip",
        "search_method": "fused matmul+approx_max_k dense (no (B,N) in HBM) "
                         "+ segment-winners bm25 kernel (exact select, "
                         f"rt {rt_used})",
        "value": headline["qps"],
        "unit": "queries/s",
        "vs_baseline": headline["vs_baseline"],
        "recall_at_10_vs_exact_f32": rec,
        "recall_gate": RECALL_GATE,
        "recall_gate_passed": gate_ok,
        "recall_target_used": rt_used,
        "recall_autotune": autotune_history,
        "corpus": {"n_docs": headline["n_docs"], "dim": 1024,
                   "dtype": "bfloat16" if on_tpu else "float32"},
        "batch": headline["batch"],
        "latency_ms_per_batch": headline["latency_ms_per_batch"],
        "achieved_tflops": headline["achieved_tflops"],
        "mfu": headline["mfu"],
        "true_device": true_dev,
        "peak_tflops_assumed": round(peak_tflops(
            jax.devices()[0].device_kind) / 1e12) if on_tpu else None,
        "cpu_baseline_qps": headline["cpu_baseline_qps"],
        "kernel_parity": parity,
        "encoder": encoder,
        "scale_1m": scale_1m,
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))
    return 0 if gate_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
