"""End-to-end serving benchmark: QueryProcessor.process_batch steady-state.

Builds a synthetic 10k-note KB (hash embeddings, real device retrieval),
then measures steady-state batched QPS with the full host answer stack
(evidence rerank, path validation, EFSA). Reusable successor to the ad-hoc
measurement recorded in docs/architecture.md.
"""
import argparse
import time

import numpy as np

from anorag_tpu.config import ConfigLoader
from anorag_tpu.query.processor import QueryProcessor


def make_kb(n_notes: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    first = ["Aurora", "Marcus", "Elena", "David", "Sofia", "Liam", "Nora", "Felix",
             "Iris", "Hugo", "Maya", "Oscar", "Tara", "Ivan", "Lena", "Rex"]
    last = ["Lane", "Webb", "Cortez", "Kim", "Reyes", "Stone", "Park", "Vance",
            "Bloom", "Hart", "Frost", "Quinn", "Sage", "Wolf", "Moss", "Dale"]
    things = ["Horizon", "River", "Summit", "Garden", "Harbor", "Canyon", "Meadow",
              "Lantern", "Mirror", "Anchor", "Beacon", "Orchard", "Prism", "Atlas"]
    notes, probes = [], []
    for i in range(n_notes):
        person = f"{first[rng.integers(len(first))]} {last[rng.integers(len(last))]} {i}"
        thing = f"{things[rng.integers(len(things))]} {i}"
        content = f"{thing} was created by {person}."
        notes.append({
            "note_id": f"n{i}", "doc_id": f"doc_{i}", "title": thing,
            "content": content, "text": content, "raw_span": content,
            "entities": [thing, person], "paragraph_idxs": [i],
        })
        if i % (n_notes // 64 or 1) == 0:
            probes.append((f"Who created {thing}?", person))
    return notes, probes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-notes", type=int, default=10_000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steady-batches", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4,
                    help="device batches in flight for the pipelined path")
    args = ap.parse_args()

    loader = ConfigLoader(auto_load=False)
    loader.set("embedding.backend", "hash")
    loader.set("embedding.dim", 1024)
    loader.set("vector_store.index_type", "Flat")
    loader.set("vector_store.top_k", 10)
    loader.set("hybrid_search.lexical_fallback.noise_threshold", 0.0)

    notes, probes = make_kb(args.n_notes)
    t0 = time.perf_counter()
    qp = QueryProcessor(notes, cfg=loader, llm=None)
    print(f"KB build ({args.n_notes} notes): {time.perf_counter()-t0:.1f}s", flush=True)

    queries = [q for q, _ in probes][: args.batch]
    want = [a for _, a in probes][: args.batch]
    while len(queries) < args.batch:
        queries.append(queries[-1])
        want.append(want[-1])

    # warm-up: compile all bucketed shapes
    for _ in range(2):
        res = qp.process_batch(queries)
    correct = sum(1 for r, w in zip(res, want) if w.lower() in str(r.get("answer", "")).lower())

    t0 = time.perf_counter()
    for _ in range(args.steady_batches):
        qp.process_batch(queries)
    dt = (time.perf_counter() - t0) / args.steady_batches
    qps = args.batch / dt

    # device-vs-host split: retrieval alone isolates the device dispatch +
    # tunnel wait; the rest is host answer stages. On a tunneled TPU the
    # device wait is dominated by fixed round-trip latency (~30-95ms
    # observed), not compute — directly-attached hardware removes it.
    # pipelined: up to `depth` device batches in flight while the host
    # answers batch i (stage timings land in the metrics sink)
    t0 = time.perf_counter()
    n_res = sum(len(out) for out in
                qp.process_stream([queries] * args.steady_batches,
                                  depth=args.depth))
    dt_p = (time.perf_counter() - t0) / args.steady_batches
    assert n_res == args.batch * args.steady_batches

    # ServingEngine: cross-REQUEST pipelining (the serve.py production
    # path) — 4 concurrent clients, each steady_batches requests; the one
    # dispatcher keeps `depth` device batches in flight across clients
    import concurrent.futures as cf

    from anorag_tpu.serving import ServingEngine

    engine = ServingEngine(qp, sub_batch=args.batch, depth=args.depth)
    engine.process(queries)  # warm
    n_clients = 4

    lat_ms: list = []          # per-request wall latency under contention
    lat_lock = __import__("threading").Lock()

    def client(_):
        for _ in range(args.steady_batches):
            t = time.perf_counter()
            rows = engine.process(queries)
            ms = (time.perf_counter() - t) * 1e3
            with lat_lock:
                lat_ms.append(ms)
            assert len(rows) == args.batch
        return True

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=n_clients) as ex:
        list(ex.map(client, range(n_clients)))
    dt_e = (time.perf_counter() - t0) / (args.steady_batches * n_clients)
    engine.close()
    lat = np.sort(np.asarray(lat_ms))
    p50, p95, p99 = (float(np.percentile(lat, p)) for p in (50, 95, 99))
    print(f"engine request latency under {n_clients}-client contention: "
          f"p50 {p50:.0f} ms, p95 {p95:.0f} ms, p99 {p99:.0f} ms "
          f"(batch={args.batch}/request, n={len(lat)})", flush=True)

    qp.retriever.hybrid_search(queries)  # warm (own shape bucket)
    t0 = time.perf_counter()
    for _ in range(args.steady_batches):
        qp.retriever.hybrid_search(queries)
    dev = (time.perf_counter() - t0) / args.steady_batches
    print(f"steady-state: {dt*1e3:.1f} ms/batch{args.batch} = {qps:.0f} QPS "
          f"({dt/args.batch*1e3:.2f} ms/query); pipelined: {dt_p*1e3:.1f} ms/batch "
          f"= {args.batch/dt_p:.0f} QPS; engine({n_clients} clients): "
          f"{dt_e*1e3:.1f} ms/batch = {args.batch/dt_e:.0f} QPS; "
          f"retrieval(device+tunnel) "
          f"{dev*1e3:.1f} ms, host stages {max(dt-dev,0)*1e3:.1f} ms; "
          f"answer accuracy on probes: {correct}/{args.batch}", flush=True)

    # ---- per-phase breakdown + attached-hardware projection -------------
    # Phases: (1) transport round-trip floor via a tiny jitted op — on the
    # tunneled rig this is pure fixed latency every dispatch pays; (2) the
    # host cost of issuing a retrieval (encode + BM25 plan + async
    # dispatch); (3) the blocking wait for device results (= kernel time +
    # transport); (4) row materialization; (5) host answer stages. The
    # attached-hardware projection removes the transport floor from the
    # device wait (kernel time stays) and pipelines device against host:
    # ms/batch = max(dispatch + kernel, finalize + assemble).
    import json as _json

    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda a: (a @ a))
    xt = jnp.ones((8, 8), jnp.float32)
    float(np.asarray(tiny(xt))[0, 0])                      # compile
    rtts = []
    for _ in range(20):
        t = time.perf_counter()
        float(np.asarray(tiny(xt))[0, 0])
        rtts.append(time.perf_counter() - t)
    rtt_ms = float(np.median(rtts) * 1e3)

    disp_ts, wait_ts, fin_ts, asm_ts = [], [], [], []
    for _ in range(args.steady_batches):
        t = time.perf_counter()
        handle = qp.retriever.hybrid_search_dispatch(queries)
        disp_ts.append(time.perf_counter() - t)
        t = time.perf_counter()
        vals = np.asarray(handle[2])                       # block on device
        ids = np.asarray(handle[3])
        wait_ts.append(time.perf_counter() - t)
        t = time.perf_counter()
        rows = qp.retriever.hybrid_search_finalize(
            (handle[0], handle[1], vals, ids))
        fin_ts.append(time.perf_counter() - t)
        t = time.perf_counter()
        qp._assemble_batch(rows, queries, None)
        asm_ts.append(time.perf_counter() - t)
    dispatch_ms = float(np.median(disp_ts) * 1e3)
    device_wait_ms = float(np.median(wait_ts) * 1e3)
    finalize_ms = float(np.median(fin_ts) * 1e3)
    assemble_ms = float(np.median(asm_ts) * 1e3)
    kernel_ms = max(device_wait_ms - rtt_ms, 0.05)
    attached_batch_ms = max(dispatch_ms + kernel_ms,
                            finalize_ms + assemble_ms)
    projected_qps = args.batch / (attached_batch_ms / 1e3)
    print(_json.dumps({
        "metric": "serving_qps", "value": round(args.batch / dt_e, 1),
        "unit": "qps", "batch": args.batch, "n_notes": args.n_notes,
        "accuracy_probes": f"{correct}/{args.batch}",
        "qps_sequential": round(qps, 1),
        "qps_pipelined": round(args.batch / dt_p, 1),
        "request_latency_ms": {"p50": round(p50, 1), "p95": round(p95, 1),
                               "p99": round(p99, 1)},
        "phases_ms": {
            "transport_rtt": round(rtt_ms, 2),
            "dispatch_host": round(dispatch_ms, 2),
            "device_wait": round(device_wait_ms, 2),
            "device_kernel_est": round(kernel_ms, 2),
            "finalize_rows": round(finalize_ms, 2),
            "host_answer_stages": round(assemble_ms, 2),
        },
        "projection_attached": {
            "ms_per_batch": round(attached_batch_ms, 2),
            "qps": round(projected_qps, 1),
            "derivation": "max(dispatch_host + device_kernel_est, "
                          "finalize_rows + host_answer_stages); "
                          "device_kernel_est = device_wait - transport_rtt",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
