"""Run the held-out paraphrase sheet (scripts/gen_heldout_musique.py)
through the full pipeline and report the honest floor.

Protocol (VERDICT r3 next-step #1): the paraphrase bank lives only in
gen_heldout_musique.py; the floor this prints is recorded in HELDOUT.md /
README without same-session solver patches. Mirrors the reference's
external-dataset + fixed-evaluator loop (/root/reference/run_evaluation.py:
29-60) as closely as the image allows.

Usage: python scripts/run_heldout.py [--n 188] [--seed 77] [--report out.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=188)
    ap.add_argument("--distractors", type=int, default=4)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--p-evidence", type=float, default=0.8)
    ap.add_argument("--p-question", type=float, default=0.6)
    ap.add_argument("--report", default="docs/heldout_report.json")
    ap.add_argument("--embedder", default="hash",
                    choices=("hash", "trained"),
                    help="trained = the in-image 24L/1024h checkpoint "
                    "(checkpoints/encoder_synth_full) as the pipeline "
                    "embedder — the VERDICT r4 #4 end-to-end proof")
    ap.add_argument("--device", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--bank", default="v1",
                    help="paraphrase bank (v1 = dev since round 4; v2 = "
                         "the held-out test bank)")
    ap.add_argument("--verbose", action="store_true",
                    help="print each miss (question/gold/pred)")
    args = ap.parse_args()

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from gen_heldout_musique import make_heldout
    from gen_synth_musique import N_KINDS

    from anorag_tpu.config import config as cfg
    from anorag_tpu.eval.musique import (answer_em, evaluate_dataset,
                                         gold_aliases)
    from anorag_tpu.pipeline_musique import process_musique_item

    if args.embedder == "trained":
        import json as _json
        rep = _json.loads(open("checkpoints/encoder_synth_full_report.json"
                               ).read())["config"]
        cfg.set("embedding.backend", "jax")
        cfg.set("embedding.model_name", "")
        cfg.set("embedding.dim", rep["hidden"])
        cfg.set("embedding.checkpoint_path",
                str(Path("checkpoints/encoder_synth_full").resolve()))
        cfg.set("encoder", {"vocab_size": rep["vocab"],
                            "hidden_size": rep["hidden"],
                            "num_layers": rep["layers"],
                            "num_heads": rep["heads"],
                            "intermediate_size": rep["ffn"],
                            # the checkpoint's position table is
                            # (max_position, hidden) — must match or
                            # orbax refuses the restore
                            "max_position": rep.get("max_position", 128),
                            "pooling": rep.get("pooling", "mean")})
        cfg.set("embedding.max_length", rep.get("max_position", 128))
    else:
        cfg.set("embedding.backend", "hash")
        cfg.set("embedding.dim", 128)
    cfg.set("vector_store.index_type", "Flat")

    items = make_heldout(args.n, args.distractors, args.seed,
                         args.p_evidence, args.p_question, args.bank)
    preds = []
    kind_hits: dict = defaultdict(lambda: [0, 0])
    with tempfile.TemporaryDirectory() as td:
        for it in items:
            res = process_musique_item(it, Path(td) / it["id"],
                                       cfg=cfg, llm=None)
            preds.append(res)
            if it.get("answerable", True):
                i = int(it["id"].split("_")[1]) % N_KINDS
                em = answer_em(res.get("predicted_answer") or "",
                               gold_aliases(it))
                kind_hits[i][0] += int(em == 1.0)
                kind_hits[i][1] += 1
                if args.verbose and em < 1.0:
                    print(f"MISS kind {i} | {it['question']}\n"
                          f"  gold: {it['answer']} | "
                          f"pred: {res.get('predicted_answer')} "
                          f"({res.get('answer_method')})")
    metrics = evaluate_dataset(preds, items)
    missed = {k: f"{h}/{n}" for k, (h, n) in sorted(kind_hits.items())
              if h < n}
    report = {
        "protocol": "heldout paraphrase sheet (solver-blind bank, "
                    "gen_heldout_musique.py)",
        "bank": args.bank,
        "n_items": args.n, "seed": args.seed,
        "p_evidence": args.p_evidence, "p_question": args.p_question,
        "metrics": {k: round(v, 4) for k, v in metrics.items()},
        "kinds_with_misses": missed,
    }
    out = Path(args.report)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({"bank": args.bank, "heldout_em": report["metrics"].get("answer_em"),
                      "heldout_f1": report["metrics"].get("answer_f1"),
                      "heldout_sup_f1": report["metrics"].get("support_f1"),
                      "n": args.n, "kinds_with_misses": len(missed)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
