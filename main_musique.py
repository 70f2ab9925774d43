#!/usr/bin/env python
"""MuSiQue batch driver.

Parity target: /root/reference/main_musique.py:674-811 — numbered work-dir
management, a shared LLM + embedding manager across worker threads, the
per-item pipeline with timeout + real-time jsonl appends, and continue-mode
resume.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

from anorag_tpu.config import config
from anorag_tpu.pipeline_musique import MusiqueProcessor
from anorag_tpu.utils.file_io import next_work_dir, read_jsonl, rewire_storage
from anorag_tpu.utils.logging import setup_logging


def main() -> int:
    ap = argparse.ArgumentParser(description="MuSiQue batch pipeline")
    ap.add_argument("input", help="MuSiQue jsonl (items with paragraphs + question)")
    ap.add_argument("output", help="predictions jsonl")
    ap.add_argument("--config", default=None)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=300.0)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-llm", action="store_true")
    ap.add_argument("--enable-cor", action="store_true")
    args = ap.parse_args()

    if args.config:
        config.load_config(args.config)
    work = next_work_dir(Path(config.get("storage.result_root", "./result")))
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    rewire_storage(config, work)
    setup_logging(str(work / "musique.log"))

    items = read_jsonl(args.input)
    if args.limit:
        items = items[: args.limit]

    llm = None
    if not args.no_llm:
        from anorag_tpu.llm.local_llm import LocalLLM

        llm = LocalLLM(cfg=config)
        if not llm.is_available():
            print("warning: LLM endpoint unreachable; running LLM-free", file=sys.stderr)
            llm = None

    from anorag_tpu.models.embedding_manager import EmbeddingManager

    em = EmbeddingManager(cfg=config, singleton=False)  # shared across threads

    mp = MusiqueProcessor(work, llm=llm, cfg=config, embedding_manager=em,
                          max_workers=args.workers, item_timeout=args.timeout,
                          enable_cor=args.enable_cor)
    results = mp.process_dataset(items, args.output, resume=not args.no_resume)
    n_err = sum(1 for r in results if r.get("error"))
    print(f"done: {len(results)} items ({n_err} errors) -> {args.output}; work dir {work}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
