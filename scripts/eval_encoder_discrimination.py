"""Discriminating encoder eval: trained vs hash vs random (VERDICT r4 #4).

The standard synth recall eval saturates (hash recall@10 = 1.0), so it
cannot distinguish the TRAINED checkpoint from a hash function. This eval
is built to separate them:

* CONFUSABLE CORPUS — worlds share work-title first words AND suffixes
  ("Gorza Echo" / "Gorza Steps" / "Mira Echo"), so title-token overlap
  alone no longer isolates the gold paragraph;
* PARAPHRASED SURFACES — queries and evidence are paraphrased with
  DIFFERENT dev banks (questions d1-style, evidence d2-style,
  scripts/gen_heldout_musique.py), so content-word overlap between query
  and gold is near zero and bag-of-token matching has nothing left.

Arms: hash embedder, randomly-initialized encoder (same architecture),
trained checkpoint (checkpoints/encoder_synth_full). Reports recall@10
per arm; the claim "the trained encoder learned something a hash cannot
do" requires trained > hash and hash < 0.9.

Reference parity: semantic embeddings are the reference's retrieval core
(vector_store/embedding_manager.py:374-407 bge-m3); this is the in-image
substitute's proof of semanticity.

Usage: python scripts/eval_encoder_discrimination.py [--worlds 60]
       [--group 12] [--device cpu|tpu]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_confusable_eval(n_worlds: int, group: int, seed: int):
    """[(query, gold_idx)] + corpus with shared-title-token worlds and
    cross-bank paraphrase (questions d1, evidence d2)."""
    from gen_heldout_musique import _E_D2, _Q_D1, _apply
    from gen_synth_musique import _SYL, _paragraphs, _world

    rng = np.random.default_rng(seed)
    firsts = []
    while len(firsts) < max(1, n_worlds // group):
        f = "".join(rng.choice(_SYL, 2)).capitalize()
        if f not in firsts:
            firsts.append(f)
    corpus, queries, gold = [], [], []
    seen = set()
    for i in range(n_worlds):
        # the (first-word x suffix) space is small (~8 suffixes); bound
        # the fresh-title retry and widen to a random first word when a
        # group exhausts its combinations
        for tries in range(60):
            w = _world(rng, work_first=(firsts[i % len(firsts)]
                                        if tries < 30 else None))
            if w["work"] not in seen:
                seen.add(w["work"])
                break
        paras = _paragraphs(w, rng)
        texts = [_apply(f"{t}. {x}", _E_D2, rng, p=1.0) for t, x in paras]
        base = len(corpus)
        corpus.extend(texts)
        for q, gi in (
            (f"Who performed {w['work']}?", 0),
            (f"When was {w['work']} released?", 0),
            (f"Where was {w['person']} born?", 1),
        ):
            queries.append(_apply(q, _Q_D1, rng, p=1.0))
            gold.append(base + gi)
    return queries, corpus, gold


def recall_at_k(q_emb, c_emb, gold, k=10):
    sims = q_emb @ c_emb.T
    topk = np.argpartition(-sims, min(k, sims.shape[1] - 1), axis=1)[:, :k]
    return float(np.mean([gold[i] in set(topk[i]) for i in range(len(gold))]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=60)
    ap.add_argument("--group", type=int, default=12,
                    help="worlds sharing each title first-word")
    ap.add_argument("--seed", type=int, default=31)
    ap.add_argument("--device", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--ckpt", default="checkpoints/encoder_synth_full")
    ap.add_argument("--skip-trained", action="store_true",
                    help="hash/random arms only (no checkpoint restore)")
    ap.add_argument("--report", default="docs/encoder_discrimination.json")
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    queries, corpus, gold = make_confusable_eval(
        args.worlds, args.group, args.seed)
    print(f"{len(queries)} queries over {len(corpus)} confusable "
          f"paragraphs", flush=True)

    from anorag_tpu.models.hash_embedder import HashEmbedder

    report = {"protocol": "confusable titles (shared first words/suffixes) "
                          "+ cross-bank paraphrase (q=d1, evidence=d2)",
              "n_queries": len(queries), "n_corpus": len(corpus),
              "group": args.group, "seed": args.seed}
    hash_emb = HashEmbedder(dim=1024)
    report["recall10_hash"] = round(recall_at_k(
        hash_emb.encode(queries), hash_emb.encode(corpus), gold), 4)
    print(json.dumps({"hash": report["recall10_hash"]}), flush=True)

    if not args.skip_trained:
        from anorag_tpu.models import encoder as enc
        from anorag_tpu.models.tokenizer import HashTokenizer

        rp = Path(args.ckpt + "_report.json")
        meta = json.loads(rp.read_text()) if rp.exists() else {}
        ecfg = meta.get("config") or {}
        cfg = enc.EncoderConfig(
            vocab_size=int(ecfg.get("vocab_size", 8192)),
            hidden_size=int(ecfg.get("hidden_size", 1024)),
            num_layers=int(ecfg.get("num_layers", 24)),
            num_heads=int(ecfg.get("num_heads", 16)),
            intermediate_size=int(ecfg.get("intermediate_size", 4096)),
            max_position=128, pooling="mean")
        tok = HashTokenizer(cfg.vocab_size, cfg.max_position)
        enc_jit = jax.jit(lambda p, ids, m: enc.encode(p, ids, m, cfg))

        def embed(params, texts, bs=128):
            out = []
            for lo in range(0, len(texts), bs):
                chunk = list(texts[lo:lo + bs])
                pad = bs - len(chunk)
                chunk += [""] * pad
                ids, mask = tok.encode_batch(chunk, cfg.max_position)
                width = cfg.max_position
                ids = np.pad(ids, ((0, 0), (0, width - ids.shape[1])),
                             constant_values=2)
                mask = np.pad(mask, ((0, 0), (0, width - mask.shape[1])))
                e = np.asarray(enc_jit(params, ids, mask))
                out.append(e[: bs - pad] if pad else e)
            return np.concatenate(out, axis=0)

        params = enc.init_params(jax.random.PRNGKey(0), cfg)
        report["recall10_random_init"] = round(recall_at_k(
            embed(params, queries), embed(params, corpus), gold), 4)
        print(json.dumps({"random": report["recall10_random_init"]}),
              flush=True)

        import orbax.checkpoint as ocp
        params = ocp.StandardCheckpointer().restore(
            Path(args.ckpt).resolve(), params)
        report["recall10_trained"] = round(recall_at_k(
            embed(params, queries), embed(params, corpus), gold), 4)
        print(json.dumps({"trained": report["recall10_trained"]}),
              flush=True)

    Path(args.report).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
