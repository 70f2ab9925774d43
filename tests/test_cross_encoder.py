"""Listwise cross-encoder reranker: packing, scoring, training lift,
checkpoints, and the ListwiseReranker('jax') integration.

Quality regression: trained on templated slates where the gold answer
sentence and a vague distractor have IDENTICAL query-token overlap (so the
lexical backend and any bag-of-words dense score tie), the cross-encoder
must learn to rank the answer-bearing sentence first on held-out entities
(ref retrieval/listt5_reranker.py:29-230 runs a trained listwise model)."""
import numpy as np
import pytest

from anorag_tpu.models.cross_encoder import (
    CrossEncoderConfig,
    CrossEncoderReranker,
    pack_batch,
    pack_pair,
    slates_from_notes,
)
from anorag_tpu.models.tokenizer import CLS_ID, SEP_ID, HashTokenizer
from anorag_tpu.retrieval.reranker import ListwiseReranker, fuse_scores, sort_desc


def _small():
    return CrossEncoderConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                              num_heads=4, intermediate_size=128,
                              max_position=128)


def test_pack_pair_layout():
    tok = HashTokenizer(2048, 128)
    q_ids = tok.token_ids("who directed silent river")
    ids, seg = pack_pair(tok, q_ids, "marcus webb directed silent river", 64)
    assert ids[0] == CLS_ID
    assert ids[len(q_ids) + 1] == SEP_ID
    assert ids[-1] == SEP_ID
    assert len(ids) == len(seg) <= 64
    assert seg[: len(q_ids) + 2] == [0] * (len(q_ids) + 2)
    assert all(s == 1 for s in seg[len(q_ids) + 2:])


def test_pack_batch_shapes_and_score():
    xenc = CrossEncoderReranker(cfg=_small(), max_length=128)
    texts = ["alpha beta gamma", "delta epsilon", "zeta"]
    batch = pack_batch(xenc.tokenizer, "some query", texts, 128)
    assert batch["ids"].shape == batch["mask"].shape == batch["seg"].shape
    assert batch["ids"].shape[1] % 128 == 0 or batch["ids"].shape[1] == 128
    scores = xenc.score_pairs("some query", texts)
    assert scores.shape == (3,)
    again = xenc.score_pairs("some query", texts)
    np.testing.assert_allclose(scores, again, rtol=1e-6)


PEOPLE = ["marcus webb", "aurora lane", "elena cortez", "david kim",
          "paul ito", "rosa nakata", "omar diallo", "grace chen",
          "leo marsh", "ida wolf"]
ROLES = ["director", "composer", "producer", "editor"]
WORKS = ["silent river", "blue horizon", "glass garden", "iron valley",
         "red meadow", "pale summit", "green harbor", "stone orchard"]


def _slate(person, role, work):
    q = f"who is the {role} of {work}"
    gold = f"{person} is the {role} of {work}."
    vague = f"{work} is a work. the {role} was widely praised."
    return q, gold, vague


def _make_slates(people, works, rng, roles=None):
    """Hard negatives: the vague same-tokens distractor + wrong-role
    statements about the same person/work (forces the model to MATCH the
    query's role token inside the candidate, not just spot patterns)."""
    slates = []
    for person in people:
        for work in works:
            for role in (roles or ROLES):
                q, gold, vague = _slate(person, role, work)
                wrong = [r for r in ROLES if r != role]
                others = [f"{person} is the {wr} of {work}." for wr in wrong[:2]]
                slates.append((q, gold, [vague] + others))
    return slates


@pytest.fixture(scope="module")
def trained_xenc():
    rng = np.random.default_rng(0)
    train = _make_slates(PEOPLE[:7], WORKS[:6], rng)
    xenc = CrossEncoderReranker(cfg=_small(), max_length=64, seed=0)
    hist = xenc.train(train, epochs=20, batch_size=8, slate_size=4,
                      learning_rate=1e-3, max_length=64, log_every=100)
    assert np.mean(hist[-10:]) < 0.6  # converging (starts at ln(4)=1.386)
    return xenc


def _mrr(xenc, slates):
    rr = []
    for q, gold, negs in slates:
        texts = [gold] + list(negs)
        scores = xenc.score_pairs(q, texts)
        rank = 1 + int((scores > scores[0]).sum())
        rr.append(1.0 / rank)
    return float(np.mean(rr))


def test_training_lifts_heldout_ranking(trained_xenc):
    rng = np.random.default_rng(1)
    heldout = _make_slates(PEOPLE[7:], WORKS[6:], rng,
                           roles=ROLES[:2])  # unseen entities
    untrained = CrossEncoderReranker(cfg=_small(), max_length=64, seed=3)
    mrr_before = _mrr(untrained, heldout)
    mrr_after = _mrr(trained_xenc, heldout)
    assert mrr_after >= 0.85, f"trained MRR too low: {mrr_after}"
    assert mrr_after > mrr_before + 0.2, (mrr_before, mrr_after)


def test_rerank_beats_tied_lexical_overlap(trained_xenc):
    """Gold and the vague distractor contain the same query tokens — the
    lexical backend ties; the trained cross-encoder must split the tie."""
    q, gold, vague = _slate(PEOPLE[8], ROLES[0], WORKS[7])
    cands = [
        {"note_id": "vague", "title": "", "content": vague, "final_score": 0.9},
        {"note_id": "gold", "title": "", "content": gold, "final_score": 0.85},
    ]
    lex = ListwiseReranker(backend="lexical")
    lex_scores = lex.score(q, cands)
    assert abs(lex_scores[0] - lex_scores[1]) < 1e-9  # genuinely tied

    jx = ListwiseReranker(backend="jax", cross_encoder=trained_xenc)
    jx_scores = jx.score(q, cands)
    fused = sort_desc(fuse_scores(cands, jx_scores), "fused_score")
    assert fused[0]["note_id"] == "gold", (jx_scores, fused)


def test_checkpoint_roundtrip(tmp_path, trained_xenc):
    path = tmp_path / "xenc_ckpt"
    assert trained_xenc.save_checkpoint(path)
    fresh = CrossEncoderReranker(cfg=_small(), max_length=64, seed=9)
    q, gold, vague = _slate(PEOPLE[9], ROLES[1], WORKS[6])
    before = fresh.score_pairs(q, [gold, vague])
    assert fresh.restore_checkpoint(path)
    after = fresh.score_pairs(q, [gold, vague])
    want = trained_xenc.score_pairs(q, [gold, vague])
    np.testing.assert_allclose(after, want, rtol=1e-5)
    assert not np.allclose(before, after)


def test_slates_from_notes(notes):
    slates = slates_from_notes(notes, n_negatives=4)
    assert len(slates) == len(notes)
    q, pos, negs = slates[0]
    assert q and pos and len(negs) == 4
    assert pos not in negs


def test_query_processor_wires_jax_backend():
    from tests.test_query_processor import _cfg, _kb_notes

    from anorag_tpu.query.processor import QueryProcessor

    cfg = _cfg(**{"rerank.enabled": True, "rerank.backend": "jax"})
    qp = QueryProcessor(_kb_notes(), cfg=cfg, llm=None)
    assert qp.reranker is not None and qp.reranker.backend == "jax"
    res = qp.process("Who is the spouse of the performer of Blue Horizon?")
    assert res["answer"]
