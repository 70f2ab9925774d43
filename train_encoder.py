#!/usr/bin/env python
"""Fine-tune the retrieval encoder on an atomic-notes corpus.

Contrastive InfoNCE over (pseudo-query, note) pairs, dp x tp sharded on the
device mesh, with orbax checkpoints (models/train.py). No reference
analogue — the reference is inference-only; this makes the embedding space
trainable in-framework.
"""
from __future__ import annotations

import argparse
from pathlib import Path

from anorag_tpu.config import config
from anorag_tpu.models.encoder import EncoderConfig
from anorag_tpu.models.train import EncoderTrainer, pairs_from_notes
from anorag_tpu.utils.file_io import read_json, read_jsonl
from anorag_tpu.utils.logging import setup_logging


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("notes", help="atomic_notes.json(l)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--model-parallel", type=int, default=1)
    ap.add_argument("--checkpoint", default="./result/encoder_ckpt")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--small", action="store_true", help="small debug geometry")
    args = ap.parse_args()
    if args.config:
        config.load_config(args.config)
    from anorag_tpu.device import apply_device_config

    apply_device_config(config)
    setup_logging()

    p = Path(args.notes)
    notes = read_jsonl(p) if p.suffix == ".jsonl" else read_json(p)
    pairs = pairs_from_notes(notes)
    if len(pairs) < args.batch_size:
        print(f"only {len(pairs)} usable pairs (< batch size)")
        return 1

    enc_cfg = (EncoderConfig.small() if args.small
               else EncoderConfig.from_config(config.get("encoder", {}) or {}))
    trainer = EncoderTrainer(cfg=enc_cfg, learning_rate=args.lr,
                             model_parallel=args.model_parallel)
    if args.resume:
        trainer.restore_checkpoint(args.resume)
    hist = trainer.train(pairs, epochs=args.epochs, batch_size=args.batch_size,
                         max_length=args.max_length)
    ok = trainer.save_checkpoint(args.checkpoint)
    print(f"trained {len(hist)} steps: loss {hist[0]:.4f} -> {hist[-1]:.4f}; "
          f"checkpoint {'saved to ' + args.checkpoint if ok else 'NOT saved'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
