#!/usr/bin/env python
"""Generate a synthetic MuSiQue-style dataset (the real dev set is not in
this image; BASELINE.md configs 1/4 are exercised with this stand-in).

Items follow the MuSiQue contract {id, question, answer, paragraphs:
[{idx, title, paragraph_text, is_supporting}]}: a mix of 1-hop factoids
and 2-hop bridge questions (the answer lives in a paragraph reachable
only through a bridge entity named in another), padded with distractor
paragraphs drawn from OTHER items' worlds so retrieval must actually
discriminate. Entity names are random syllable compounds — no lexical
leakage between the question surface and the answer string.

Usage: gen_synth_musique.py out.jsonl [--n 200] [--distractors 8] [--seed 0]
"""
from __future__ import annotations

import argparse
import json

import numpy as np

_SYL = ["ba", "den", "cor", "mi", "ra", "vel", "to", "lin", "sha", "gor",
        "ne", "ti", "lu", "mar", "kes", "on", "za", "pri", "hol", "fen"]
_WORK_W = ["Horizon", "River", "Steps", "Origins", "Echo", "Garden",
           "Signal", "Harbor", "Summit", "Mosaic"]
_CITIES = ["Boston", "Chicago", "Denver", "Austin", "Seattle", "Portland",
           "Atlanta", "Nashville", "Tucson", "Madison"]


def _name(rng) -> str:
    def word():
        return "".join(rng.choice(_SYL, rng.integers(2, 4))).capitalize()
    return f"{word()} {word()}"


def _world(rng):
    """One item's facts: performer, work, spouse, founder, city, year."""
    return {
        "person": _name(rng),
        "work": f"{''.join(rng.choice(_SYL, 2)).capitalize()} {rng.choice(_WORK_W)}",
        "spouse": _name(rng),
        "city": str(rng.choice(_CITIES)),
        "spouse_city": str(rng.choice(_CITIES)),
        "year": int(rng.integers(1950, 2020)),
    }


def _paragraphs(w):
    return [
        (f"{w['work']} (album)",
         f"{w['work']} is an album performed by {w['person']}. "
         f"It was released in {w['year']}."),
        (w["person"],
         f"{w['person']} married {w['spouse']}. "
         f"The spouse of {w['person']} is {w['spouse']}. "
         f"{w['person']} was born in {w['city']}."),
        (w["spouse"],
         f"{w['spouse']} is married to {w['person']}. "
         f"{w['spouse']} was born in {w['spouse_city']}."),
    ]


def make_items(n: int, distractors: int, seed: int):
    rng = np.random.default_rng(seed)
    worlds = [_world(rng) for _ in range(n)]
    items = []
    for i, w in enumerate(worlds):
        kind = i % 5
        if kind == 4:
            q, a = (f"Where was the spouse of the performer of {w['work']} born?",
                    w["spouse_city"])
        elif kind == 0:
            q, a = f"Who is the spouse of the performer of {w['work']}?", w["spouse"]
        elif kind == 1:
            q, a = f"Where was the performer of {w['work']} born?", w["city"]
        elif kind == 2:
            q, a = f"Who performed {w['work']}?", w["person"]
        else:
            q, a = f"When was {w['work']} released?", str(w["year"])
        # 3-hop needs all three paragraphs; 2-hop the first two; 1-hop
        # only the work one
        support_flags = [True, kind in (0, 1, 4), kind == 4]
        paras = []
        for (title, text), sup in zip(_paragraphs(w), support_flags):
            paras.append({"idx": len(paras), "title": title,
                          "paragraph_text": text, "is_supporting": sup})
        # distractors from other items' worlds (real competing facts, same
        # sentence shapes — not filler text)
        others = rng.choice([j for j in range(n) if j != i],
                            min(distractors, n - 1), replace=False)
        for j in others:
            for title, text in _paragraphs(worlds[j])[: 1 + int(rng.integers(0, 2))]:
                paras.append({"idx": len(paras), "title": title,
                              "paragraph_text": text, "is_supporting": False})
        order = rng.permutation(len(paras))
        remap = [paras[k] for k in order]
        for new_idx, p in enumerate(remap):
            p["idx"] = new_idx
        items.append({"id": f"synth_{i}", "question": q, "answer": a,
                      "paragraphs": remap})
    return items


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--distractors", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    items = make_items(args.n, args.distractors, args.seed)
    with open(args.out, "w") as fh:
        for it in items:
            fh.write(json.dumps(it) + "\n")
    multi = sum(1 for it in items if "spouse" in it["question"] or "born" in it["question"])
    print(f"wrote {len(items)} items ({multi} multi-hop) -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
