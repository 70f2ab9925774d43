#!/usr/bin/env python
"""HTTP serving front end for a built knowledge base.

Production-serving surface (no reference analogue — the reference is
CLI-only): loads KB artifacts once, keeps the corpus on-device, and serves

  POST /query        {"query": "...", "top_k": 10}      -> answer + notes
  POST /query_batch  {"queries": [...], "top_k": 10}    -> answers (one fused
                     device pass for the whole batch's retrieval)
  POST /search       {"query": "...", "top_k": 10}      -> ranked notes only
  GET  /healthz                                         -> status + corpus size

stdlib http.server with a thread pool; the QueryProcessor is thread-safe for
reads (device arrays are immutable; host-side state is read-only after
init).
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

from anorag_tpu.config import config
from anorag_tpu.utils.file_io import latest_work_dir, read_json
from anorag_tpu.utils.logging import get_logger, setup_logging

logger = get_logger("anorag.serve")


def build_processor(work_dir: str, no_llm: bool = True):
    from anorag_tpu.query.processor import QueryProcessor

    work = Path(work_dir)
    notes = read_json(work / "atomic_notes.json")
    emb_path = work / "embeddings.npy"
    embeddings = np.load(emb_path) if emb_path.exists() else None
    graph_file = work / "graph.json"
    llm = None
    if not no_llm:
        from anorag_tpu.llm.local_llm import LocalLLM

        llm = LocalLLM(cfg=config)
        if not llm.is_available():
            llm = None
    return QueryProcessor(
        notes, embeddings=embeddings,
        graph_file=str(graph_file) if graph_file.exists() else None,
        llm=llm, cfg=config,
    )


def make_handler(qp, engine=None):
    """`engine` (ServingEngine) pipelines retrieval across requests: the
    dispatcher thread keeps up to `depth` device batches in flight while
    request threads wait on futures — request B's retrieval is already on
    the device while request A runs host answer stages. Without an engine
    (tests), requests serialize behind the lock as before."""
    lock = threading.Lock()   # QueryProcessor.process mutates per-call dicts

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, ensure_ascii=False, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            logger.info("%s %s", self.address_string(), fmt % args)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "n_notes": len(qp.notes)})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
            except Exception as e:
                return self._send(400, {"error": f"bad request: {e}"})
            top_k = int(payload.get("top_k", 10))
            if self.path == "/query_batch":
                queries = payload.get("queries")
                if not isinstance(queries, list) or not queries:
                    return self._send(400, {"error": "missing 'queries' list"})
                qs = [str(x) for x in queries]
                try:
                    if engine is not None:
                        # cross-request pipelined path: this thread blocks
                        # on the future; the engine's dispatcher keeps the
                        # device busy with every in-flight request's batches
                        rows = engine.process(qs, top_k=top_k)
                    else:
                        with lock:
                            sb = int(config.get("serving.stream_batch", 64))
                            if len(qs) > sb:
                                depth = int(config.get("serving.stream_depth", 3))
                                chunks = [qs[i:i + sb] for i in range(0, len(qs), sb)]
                                rows = [r for out in qp.process_stream(
                                    chunks, top_k=top_k, depth=depth) for r in out]
                            else:
                                rows = qp.process_batch(qs, top_k=top_k)
                    return self._send(200, {"results": [
                        {"query": r["query"], "answer": r["answer"],
                         "predicted_support_idxs": r["predicted_support_idxs"],
                         "answer_method": r["answer_method"]}
                        for r in rows
                    ]})
                except Exception as e:
                    logger.exception("batch request failed")
                    return self._send(500, {"error": str(e)})
            query = str(payload.get("query") or "")
            if not query:
                return self._send(400, {"error": "missing 'query'"})
            try:
                if self.path == "/search":
                    notes = qp.retriever.retrieve(query, top_k=top_k, threshold=0.0)
                    return self._send(200, {"notes": [
                        {k: n.get(k) for k in
                         ("note_id", "title", "content", "final_score", "paragraph_idxs")}
                        for n in notes
                    ]})
                if self.path == "/query":
                    if engine is not None and not payload.get("qid"):
                        r = engine.process([query],
                                           dataset=payload.get("dataset"))[0]
                        return self._send(200, {
                            "answer": r["answer"],
                            "predicted_support_idxs": r["predicted_support_idxs"],
                            "answer_method": r["answer_method"],
                            "notes": [
                                {k: n.get(k) for k in
                                 ("note_id", "title", "content", "final_score")}
                                for n in r.get("notes", [])[:top_k]
                            ],
                        })
                    with lock:
                        res = qp.process(query, dataset=payload.get("dataset"),
                                         qid=payload.get("qid"))
                    return self._send(200, {
                        "answer": res["answer"],
                        "predicted_support_idxs": res["predicted_support_idxs"],
                        "answer_method": res["answer_method"],
                        "notes": [
                            {k: n.get(k) for k in
                             ("note_id", "title", "content", "final_score")}
                            for n in res["notes"][:top_k]
                        ],
                    })
                return self._send(404, {"error": "unknown path"})
            except Exception as e:
                logger.exception("request failed")
                return self._send(500, {"error": str(e)})

    return Handler


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--config", default=None)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--llm", action="store_true", help="wire the configured LLM")
    args = ap.parse_args()
    if args.config:
        config.load_config(args.config)
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    work = args.work_dir or latest_work_dir(config.get("storage.result_root", "./result"))
    if not work or not (Path(work) / "atomic_notes.json").exists():
        print("no knowledge base found; run `main.py process` first", file=sys.stderr)
        return 1
    setup_logging()
    qp = build_processor(str(work), no_llm=not args.llm)
    from anorag_tpu.serving import ServingEngine

    engine = ServingEngine(
        qp,
        sub_batch=int(config.get("serving.stream_batch", 64)),
        depth=int(config.get("serving.stream_depth", 4)),
        host_workers=int(config.get("serving.host_workers", 1)),
    )
    server = ThreadingHTTPServer((args.host, args.port), make_handler(qp, engine))
    print(f"serving KB ({len(qp.notes)} notes) on http://{args.host}:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
