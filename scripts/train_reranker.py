#!/usr/bin/env python
"""Train the listwise cross-encoder reranker on an atomic-notes corpus.

Builds (pseudo-query, positive, negatives) slates from the notes
(models/cross_encoder.py::slates_from_notes), trains with listwise
softmax CE, and saves an orbax checkpoint usable as `rerank.checkpoint`
with `rerank.backend: jax` (ref retrieval/listt5_reranker.py:29-230 loads
a pre-trained T5; here the model is trainable fully in-framework).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from anorag_tpu.config import config
from anorag_tpu.models.cross_encoder import (
    CrossEncoderConfig,
    CrossEncoderReranker,
    slates_from_notes,
)
from anorag_tpu.utils.file_io import read_json, read_jsonl
from anorag_tpu.utils.logging import setup_logging


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("notes", help="atomic_notes.json(l)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--slate-size", type=int, default=4)
    ap.add_argument("--negatives", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-length", type=int, default=128)
    ap.add_argument("--checkpoint", default="./result/reranker_ckpt")
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()
    if args.config:
        config.load_config(args.config)
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    setup_logging()

    path = Path(args.notes)
    notes = read_jsonl(path) if path.suffix == ".jsonl" else read_json(path)
    slates = slates_from_notes(notes, n_negatives=args.negatives)
    if not slates:
        print("no trainable slates in the notes file", file=sys.stderr)
        return 1
    xenc_cfg = CrossEncoderConfig.from_config(config.get("rerank.model", {}) or {})
    xenc = CrossEncoderReranker(cfg=xenc_cfg, max_length=args.max_length)
    if args.resume:
        xenc.restore_checkpoint(args.resume)
    hist = xenc.train(slates, epochs=args.epochs, batch_size=args.batch_size,
                      slate_size=args.slate_size, learning_rate=args.lr,
                      max_length=args.max_length)
    if not hist:
        print("no training steps ran (too few slates?)", file=sys.stderr)
        return 1
    ok = xenc.save_checkpoint(Path(args.checkpoint).resolve())
    print(f"trained {len(hist)} steps, final loss {hist[-1]:.4f}, "
          f"checkpoint {'saved to ' + args.checkpoint if ok else 'SAVE FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
