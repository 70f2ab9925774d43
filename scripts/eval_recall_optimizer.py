"""Measured effect of the recall-optimizer multi-hop sub-stage (VERDICT r4 #6).

Parity target: /root/reference/vector_store/enhanced_recall_optimizer.py:448-540
(multi-hop sub-query decomposition + supplemental retrieval + comprehensive
re-rank). This script isolates that stage on a true multi-hop slice of the
synthetic MuSiQue set: the *other* recovery stages that mask its effect in the
default pipeline (two-hop bridge expansion, graph expansion) are disabled and
the first-hop retrieval budget is constrained, then the slice runs twice —
`recall_optimizer.multi_hop_enabled` off vs on — and reports answer EM,
support F1, and gold-support recall in the selected set for both.

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


def _gold_support_recall(pred, item) -> float:
    gold = {p["idx"] for p in item["paragraphs"] if p.get("is_supporting")}
    if not gold:
        return 1.0
    got = set(pred.get("predicted_support_idxs") or [])
    return len(gold & got) / len(gold)


def run_slice(items, cfg, enabled: bool):
    from anorag_tpu.eval.musique import evaluate_dataset
    from anorag_tpu.pipeline_musique import process_musique_item

    cfg.set("recall_optimizer.multi_hop_enabled", enabled)
    cfg.set("recall_optimizer.comprehensive_rerank", enabled)
    preds, recalls = [], []
    with tempfile.TemporaryDirectory() as td:
        for it in items:
            res = process_musique_item(
                it, Path(td) / f"{it['id']}_{int(enabled)}", cfg=cfg, llm=None)
            preds.append(res)
            recalls.append(_gold_support_recall(res, it))
    m = evaluate_dataset(preds, items)
    return {"answer_em": round(m.get("answer_em", 0.0), 4),
            "support_f1": round(m.get("support_f1", 0.0), 4),
            "gold_support_recall": round(sum(recalls) / len(recalls), 4)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=47)
    ap.add_argument("--distractors", type=int, default=4)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--report", default="docs/recall_optimizer_ablation.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")

    from gen_synth_musique import make_items

    from anorag_tpu.config import config as cfg

    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")
    # isolation regime: constrain first-hop recall and switch off the other
    # recovery stages so the recall-optimizer sub-stage is the only one that
    # can close evidence gaps
    cfg.set("retrieval.embed_topk_hop1", 5)
    cfg.set("retrieval.bm25_topk_hop1", 5)
    cfg.set("hybrid_search.two_hop.enabled", False)
    cfg.set("retrieval.multi_hop.enabled", False)

    items = [it for it in make_items(args.n, args.distractors, args.seed)
             if it.get("answerable", True)
             and sum(1 for p in it["paragraphs"] if p.get("is_supporting")) >= 2]
    off = run_slice(items, cfg, enabled=False)
    on = run_slice(items, cfg, enabled=True)
    report = {
        "protocol": "multi-hop slice (>=2 gold supports), two-hop/graph "
                    "expansion disabled, first-hop top-k 5/5, hash embedder",
        "n_items": len(items), "seed": args.seed,
        "multi_hop_off": off, "multi_hop_on": on,
        "delta_em": round(on["answer_em"] - off["answer_em"], 4),
        "delta_support_recall": round(
            on["gold_support_recall"] - off["gold_support_recall"], 4),
    }
    out = Path(args.report)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({"n": len(items), "off": off, "on": on,
                      "delta_em": report["delta_em"],
                      "delta_support_recall": report["delta_support_recall"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
