#!/usr/bin/env python
"""Rebuild the vector index from a notes file, with staleness checks.

Parity target: /root/reference/vector_store/rebuild_vector_index.py:30-127 —
skip the rebuild when the existing index's config hash matches, else re-embed
and rebuild, registering the new index version.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from anorag_tpu.config import config
from anorag_tpu.index.embedding_strategy import EmbeddingConfig, IndexVersionRegistry
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.retrieval.retriever import VectorRetriever
from anorag_tpu.utils.file_io import read_json, read_jsonl


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("notes", help="atomic_notes.json or .jsonl")
    ap.add_argument("out_dir", help="index output directory")
    ap.add_argument("--config", default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    if args.config:
        config.load_config(args.config)

    notes_path = Path(args.notes)
    notes = (read_jsonl(notes_path) if notes_path.suffix == ".jsonl"
             else read_json(notes_path))
    emb_cfg_dict = config.get("embedding", {}) or {}
    emb_cfg = EmbeddingConfig(
        model_name=emb_cfg_dict.get("model_name", "BAAI/bge-m3"),
        backend=emb_cfg_dict.get("backend", "jax"),
        dim=emb_cfg_dict.get("dim", 1024),
        max_length=emb_cfg_dict.get("max_length", 512),
        normalize=emb_cfg_dict.get("normalize", True),
    )
    out = Path(args.out_dir)
    registry = IndexVersionRegistry(out / "index_versions.json")
    if not args.force and registry.is_compatible(emb_cfg) and (out / "atomic_notes.json").exists():
        print(json.dumps({"status": "fresh", "signature": emb_cfg.signature}))
        return 0

    em = EmbeddingManager(cfg=config, singleton=False)
    vr = VectorRetriever(embedding_manager=em,
                         index_type=config.get("vector_store.index_type", "IVFFlat"))
    vr.build_index(notes)
    vr.save(out)
    entry = registry.register(emb_cfg, str(out), len(notes))
    print(json.dumps({"status": "rebuilt", "n_notes": len(notes),
                      "signature": entry["signature"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
