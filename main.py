#!/usr/bin/env python
"""CLI: offline `process` and online `query` entry points.

Parity target: /root/reference/main.py — `process` builds the knowledge
base into a numbered work dir (storage rewiring, :39-52) with optional
engine-parallel fan-out (:122-188); `query` loads the artifacts and answers
interactively or for one question (:75-119).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from anorag_tpu.config import config
from anorag_tpu.utils.file_io import latest_work_dir, next_work_dir, read_json, rewire_storage
from anorag_tpu.utils.logging import setup_logging


def _make_llm(args):
    if args.no_llm:
        return None
    from anorag_tpu.llm.local_llm import LocalLLM

    llm = LocalLLM(cfg=config)
    if not llm.is_available():
        print("warning: configured LLM endpoint not reachable; running LLM-free",
              file=sys.stderr)
        return None
    return llm


def process_docs(args) -> int:
    if args.config:
        config.load_config(args.config)
    # reference semantics (main.py:281-288): default REUSES the latest work
    # dir so the incremental/artifact caches apply across runs; --new forces
    # a fresh numbered dir, --force reprocesses inside the reused dir
    root = Path(config.get("storage.result_root", "./result"))
    work = None if args.new else latest_work_dir(root)
    work = Path(work) if work else next_work_dir(root)
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    rewire_storage(config, work)
    import logging

    setup_logging(str(work / "run.log"),
                  level=logging.DEBUG if args.debug else logging.INFO)
    llm = _make_llm(args)

    files = [str(p) for p in args.files]
    if args.parallel and len(files) > 1:
        from anorag_tpu.parallel.interface import create_parallel_interface

        iface = create_parallel_interface(
            mode="document", work_dir=work, llm=llm, cfg=config,
            workers=args.workers, strategy=args.strategy,
        )
        out = iface.process_documents(files)
        print(f"processed {len(files)} files -> {work} "
              f"({out['results']['n_runs']} runs, {len(out['errors'])} errors)")
    else:
        from anorag_tpu.doc.processor import DocumentProcessor

        dp = DocumentProcessor(work, llm=llm, cfg=config)
        result = dp.process_documents(file_paths=files,
                                      force_reprocess=args.force)
        print(f"processed -> {work}: {result['processing_stats']}")
    return 0


def query_mode(args) -> int:
    if args.config:
        config.load_config(args.config)
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    work = Path(args.work_dir) if args.work_dir else latest_work_dir(
        config.get("storage.result_root", "./result"))
    if not work or not (Path(work) / "atomic_notes.json").exists():
        print("no knowledge base found; run `main.py process` first", file=sys.stderr)
        return 1
    import logging

    setup_logging(str(Path(work) / "query.log"),
                  level=logging.DEBUG if getattr(args, "debug", False) else logging.INFO)
    notes = read_json(Path(work) / "atomic_notes.json")
    emb_path = Path(work) / "embeddings.npy"
    embeddings = np.load(emb_path) if emb_path.exists() else None
    graph_file = Path(work) / "graph.json"

    from anorag_tpu.query.processor import QueryProcessor

    qp = QueryProcessor(
        notes, embeddings=embeddings,
        graph_file=str(graph_file) if graph_file.exists() else None,
        llm=_make_llm(args), cfg=config, work_dir=str(work),
    )
    if args.question:
        res = qp.process(args.question)
        print(f"answer: {res['answer']}")
        print(f"support: {res['predicted_support_idxs']}  "
              f"(method: {res['answer_method']})")
        return 0
    print("interactive mode — empty line to exit")
    while True:
        try:
            q = input("query> ").strip()
        except EOFError:
            break
        if not q:
            break
        res = qp.process(q)
        print(f"  {res['answer']}   (support {res['predicted_support_idxs']})")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description="anorag-tpu")
    ap.add_argument("--config", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("process", help="build the knowledge base")
    p.add_argument("files", nargs="+")
    p.add_argument("--new", action="store_true",
                   help="create a new work directory instead of reusing the latest")
    p.add_argument("--force", action="store_true",
                   help="force reprocess (ignore incremental/artifact caches)")
    p.add_argument("--debug", action="store_true", help="debug logging")
    p.add_argument("--parallel", action="store_true")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--strategy", default="hybrid",
                   choices=["copy", "split", "dispatch", "hybrid"])
    p.add_argument("--no-llm", action="store_true")
    p.set_defaults(fn=process_docs)

    q = sub.add_parser("query", help="query the knowledge base")
    q.add_argument("question", nargs="?", default=None)
    q.add_argument("--work-dir", default=None)
    q.add_argument("--debug", action="store_true", help="debug logging")
    q.add_argument("--no-llm", action="store_true")
    q.set_defaults(fn=query_mode)

    args = ap.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
