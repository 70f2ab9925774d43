"""Debug selected kinds of a DEV heldout bank (d1) through the pipeline.

Like scripts/debug_kinds.py but over gen_heldout_musique.make_heldout —
only ever point this at a bank sanctioned for inspection (d1); the blind
test bank (v3) is measured once at round end and never debugged.

Usage: python scripts/debug_heldout.py 0 8 9 [--bank d1] [--n 188]
       [--seed 77] [--notes]  # --notes prints the KB's extracted notes
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", type=int, nargs="*")
    ap.add_argument("--bank", default="d1")
    ap.add_argument("--n", type=int, default=188)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--distractors", type=int, default=4)
    ap.add_argument("--p-evidence", type=float, default=0.8)
    ap.add_argument("--p-question", type=float, default=0.6)
    ap.add_argument("--misses-only", action="store_true")
    ap.add_argument("--notes", action="store_true",
                    help="print the extracted rule notes for each item")
    ap.add_argument("--support", action="store_true",
                    help="print gold support paragraphs")
    args = ap.parse_args()
    if args.bank not in ("d1", "d2", "d3", "d4", "v1"):
        raise SystemExit(f"bank {args.bank} is not a dev bank — refusing")

    import jax
    jax.config.update("jax_platforms", "cpu")

    from gen_heldout_musique import make_heldout
    from gen_synth_musique import N_KINDS

    from anorag_tpu.config import config as cfg
    from anorag_tpu.eval.musique import answer_em, gold_aliases, support_f1
    from anorag_tpu.pipeline_musique import process_musique_item

    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")

    items = make_heldout(args.n, args.distractors, args.seed,
                         args.p_evidence, args.p_question, args.bank)
    want = set(args.kinds)
    picked = [it for it in items
              if not want or int(it["id"].split("_")[1]) % N_KINDS in want]
    hits = 0
    with tempfile.TemporaryDirectory() as td:
        for it in picked:
            res = process_musique_item(it, Path(td) / it["id"],
                                       cfg=cfg, llm=None)
            pred = res.get("predicted_answer") or ""
            em = answer_em(pred, gold_aliases(it)) if it.get(
                "answerable", True) else float(
                pred.lower().startswith("insufficient"))
            hits += int(em == 1.0)
            if args.misses_only and em == 1.0:
                continue
            sf1 = support_f1(res.get("predicted_support_idxs") or [],
                             [p["idx"] for p in it["paragraphs"]
                              if p.get("is_supporting")])
            i = int(it["id"].split("_")[1]) % N_KINDS
            mark = "OK " if em == 1.0 else "MISS"
            print(f"[{mark}] kind={i} id={it['id']} supF1={sf1:.2f} "
                  f"method={res.get('answer_method')}\n"
                  f"  q={it['question']!r}\n"
                  f"  gold={it['answer']!r} pred={pred!r}")
            if args.support and em < 1.0:
                for p in it["paragraphs"]:
                    if p.get("is_supporting"):
                        print(f"  SUP[{p['idx']}] {p['title']}: "
                              f"{p['paragraph_text']}")
            if args.notes and em < 1.0:
                from anorag_tpu.doc.processor import DocumentProcessor
                from anorag_tpu.pipeline_musique import (
                    musique_item_to_document)
                dp = DocumentProcessor(Path(td) / (it["id"] + "_dbg"),
                                       llm=None, cfg=cfg)
                kb = dp.process_documents(
                    documents=[musique_item_to_document(it)])
                for n in kb["atomic_notes"]:
                    print(f"  NOTE {n.get('head_key')!r} "
                          f"-{n.get('rel')}-> {n.get('tail_key')!r} | "
                          f"{(n.get('content') or '')[:90]!r}")
    print(f"{hits}/{len(picked)} hit")


if __name__ == "__main__":
    main()
