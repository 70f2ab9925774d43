"""Graph-distance K estimation (ref support/k_estimator.py:41-160):
anchor->answer hop distance over the candidate entity graph drives K and
tracks gold support counts better than the complexity heuristic alone."""
import numpy as np

from anorag_tpu.context.packer import ContextPacker
from anorag_tpu.support.k_estimator import KEstimator


def _chain_candidates(length: int, distractors: int = 2):
    """A bridge chain e0 -e1- e2 ... ; answer note first (top-ranked),
    question mentions the chain start entity."""
    ents = [f"ent{j}" for j in range(length + 1)]
    chain = []
    for j in range(length):
        chain.append({
            "note_id": f"c{j}",
            "doc_id": f"d{j}",
            "title": f"{ents[j]} record",
            "content": f"{ents[j]} connects to {ents[j + 1]}.",
            "entities": [ents[j], ents[j + 1]],
            "paragraph_idxs": [j],
        })
    cands = [chain[-1]] + chain[:-1]   # answer note ranked first
    for t in range(distractors):
        cands.append({
            "note_id": f"x{t}", "doc_id": f"xd{t}", "title": f"noise {t}",
            "content": f"unrelated fact number {t}.",
            "entities": [f"noise{t}"], "paragraph_idxs": [10 + t],
        })
    question = f"what does ent0 ultimately connect to"
    return question, cands, length    # gold support = chain length


def test_graph_distance_matches_chain_length():
    ke = KEstimator(base_k=2, max_k=6)
    for length in (2, 3, 4):
        q, cands, gold = _chain_candidates(length)
        d = ke.graph_distance(q, cands)
        assert d == length - 1, (length, d)
        assert ke.estimate_K_from_candidates(q, cands) == gold


def test_graph_k_tracks_gold_better_than_complexity():
    ke = KEstimator(base_k=2, max_k=6)
    err_graph = err_complexity = 0
    for length in (2, 3, 4, 5):
        q, cands, gold = _chain_candidates(length)
        err_graph += abs(ke.estimate_K_from_candidates(q, cands) - gold)
        err_complexity += abs(ke.estimate_K(q) - gold)
    assert err_graph < err_complexity, (err_graph, err_complexity)
    assert err_graph == 0


def test_fallbacks_to_complexity():
    ke = KEstimator()
    # no candidates / single candidate / zero-overlap anchor
    assert ke.estimate_K_from_candidates("who is x", []) == ke.estimate_K("who is x")
    one = [{"note_id": "a", "entities": ["e"], "content": "e.", "title": ""}]
    assert ke.estimate_K_from_candidates("who is x", one) == ke.estimate_K("who is x")
    q, cands, _ = _chain_candidates(3)
    # anchor == answer (question matches the top-ranked note itself)
    q_ans = cands[0]["content"]
    assert ke.estimate_K_from_candidates(q_ans, cands) == ke.estimate_K(q_ans)


def test_unreachable_answer_falls_back():
    ke = KEstimator()
    cands = [
        {"note_id": "a", "doc_id": "da", "title": "island",
         "content": "alpha isolated note.", "entities": ["alpha"],
         "paragraph_idxs": [0]},
        {"note_id": "b", "doc_id": "db", "title": "beta",
         "content": "beta mentions gamma.", "entities": ["beta", "gamma"],
         "paragraph_idxs": [1]},
        {"note_id": "c", "doc_id": "dc", "title": "gamma",
         "content": "gamma mentions beta.", "entities": ["gamma", "beta"],
         "paragraph_idxs": [2]},
    ]
    q = "what does beta mention"   # anchor in the b-c component, answer = a
    assert ke.estimate_K_from_candidates(q, cands) == ke.estimate_K(q)


def test_packer_uses_graph_k():
    packer = ContextPacker(k_estimator=KEstimator(base_k=2, max_k=6))
    q, cands, gold = _chain_candidates(4)
    idxs = packer.build_support_idxs(cands, q)
    assert len(idxs) == gold
