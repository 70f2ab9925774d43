"""Measured effect of the recall-optimizer multi-hop sub-stage (VERDICT r4 #6).

Parity target: /root/reference/vector_store/enhanced_recall_optimizer.py:448-540
(multi-hop sub-query decomposition + supplemental retrieval + comprehensive
re-rank). The exact-math answer stages read the full note graph, so answer EM
cannot see retrieval-stage effects; the honest measurable is GOLD-SUPPORT
COVERAGE OF THE CANDIDATE POOL the query processor hands downstream. This
script isolates the stage on a true multi-hop slice: the other recovery
stages that mask it (two-hop bridge expansion, graph expansion) are disabled
and the first-hop budget is constrained, then each item's KB is queried twice
— `recall_optimizer.multi_hop_enabled` off vs on — and the pool's gold
coverage is compared.

Usage: python scripts/eval_recall_optimizer.py [--n 47] [--seed 11]
Writes docs/recall_optimizer_ablation.json and prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _pool_coverage(notes, gold_idxs) -> float:
    got = set()
    for n in notes:
        got.update(int(p) for p in (n.get("paragraph_idxs") or []))
    return len(gold_idxs & got) / len(gold_idxs) if gold_idxs else 1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=47)
    ap.add_argument("--distractors", type=int, default=8)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--report", default="docs/recall_optimizer_ablation.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from gen_synth_musique import make_items

    from anorag_tpu.config import config as cfg
    from anorag_tpu.doc.processor import DocumentProcessor
    from anorag_tpu.pipeline_musique import musique_item_to_document
    from anorag_tpu.query.processor import QueryProcessor

    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")
    # isolation regime: constrain first-hop recall and switch off the other
    # recovery stages so the recall-optimizer sub-stage is the only one that
    # can close evidence gaps in the pool
    cfg.set("retrieval.embed_topk_hop1", 3)
    cfg.set("retrieval.bm25_topk_hop1", 3)
    cfg.set("hybrid_search.two_hop.enabled", False)
    cfg.set("retrieval.multi_hop.enabled", False)

    items = [it for it in make_items(args.n, args.distractors, args.seed)
             if it.get("answerable", True)
             and sum(1 for p in it["paragraphs"] if p.get("is_supporting")) >= 2]
    cov = {False: [], True: []}
    with tempfile.TemporaryDirectory() as td:
        for it in items:
            dp = DocumentProcessor(Path(td) / it["id"], llm=None, cfg=cfg)
            kb = dp.process_documents(
                documents=[musique_item_to_document(it)])
            gold = {p["idx"] for p in it["paragraphs"]
                    if p.get("is_supporting")}
            for enabled in (False, True):
                cfg.set("recall_optimizer.multi_hop_enabled", enabled)
                cfg.set("recall_optimizer.comprehensive_rerank", enabled)
                qp = QueryProcessor(kb["atomic_notes"], cfg=cfg, llm=None,
                                    work_dir=Path(td) / f"{it['id']}_q{int(enabled)}")
                res = qp.process(it["question"])
                cov[enabled].append(
                    _pool_coverage(res.get("candidate_notes") or [], gold))
    off = round(sum(cov[False]) / len(cov[False]), 4)
    on = round(sum(cov[True]) / len(cov[True]), 4)
    report = {
        "protocol": "gold-support coverage of the post-recall-optimizer "
                    "candidate pool; multi-hop slice (>=2 gold supports), "
                    "two-hop/graph expansion disabled, first-hop top-k 3/3, "
                    "8 distractors, hash embedder",
        "n_items": len(items), "seed": args.seed,
        "pool_gold_coverage_off": off,
        "pool_gold_coverage_on": on,
        "delta": round(on - off, 4),
    }
    out = Path(args.report)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
