"""Run selected synthetic-eval kinds through the full pipeline and print
question / gold / predicted — the close-the-eval debugging loop.

Usage: python scripts/debug_kinds.py 66 67 68 69 [--n 4] [--seed 9]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", type=int, nargs="+")
    ap.add_argument("--n", type=int, default=4,
                    help="items per kind")
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument("--distractors", type=int, default=4)
    ap.add_argument("--verbose", action="store_true",
                    help="print support paragraphs for misses")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from scripts.gen_synth_musique import N_KINDS, make_items
    from anorag_tpu.config import config as cfg
    from anorag_tpu.eval.musique import answer_em, gold_aliases, support_f1
    from anorag_tpu.pipeline_musique import process_musique_item

    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")

    n_cycle = N_KINDS
    total = n_cycle * args.n
    items = make_items(total, distractors=args.distractors, seed=args.seed)
    picked = [it for i, it in enumerate(items)
              if i % n_cycle in set(args.kinds)]
    print(f"{len(picked)} items across kinds {sorted(set(args.kinds))}")
    hits = misses = 0
    with tempfile.TemporaryDirectory() as td:
        for it in picked:
            res = process_musique_item(it, Path(td) / it["id"],
                                       cfg=cfg, llm=None)
            pred = res.get("predicted_answer") or ""
            em = answer_em(pred, gold_aliases(it))
            sf1 = support_f1(res.get("predicted_support_idxs") or [],
                             [p["idx"] for p in it["paragraphs"]
                              if p.get("is_supporting")])
            i = int(it["id"].split("_")[1]) % n_cycle
            mark = "OK " if em == 1.0 else "MISS"
            print(f"[{mark}] kind={i} supF1={sf1:.2f} "
                  f"q={it['question']!r}\n       gold={it['answer']!r} "
                  f"pred={pred!r}")
            if em == 1.0:
                hits += 1
            else:
                misses += 1
                if args.verbose:
                    for p in it["paragraphs"]:
                        if p.get("is_supporting"):
                            print(f"       SUP[{p['idx']}] {p['title']}: "
                                  f"{p['paragraph_text'][:200]}")
    print(f"\n{hits}/{hits + misses} EM")


if __name__ == "__main__":
    main()
