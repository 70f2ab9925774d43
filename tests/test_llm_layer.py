"""LLM layer with mock transports: clients, factory, dispatcher,
note generation, early stop, CoR, auditor."""
import json

import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.llm.base import clean_response, with_retry
from anorag_tpu.llm.clients import LMStudioClient, OllamaClient, OpenAIClient
from anorag_tpu.llm.cor_controller import chain_of_retrieval
from anorag_tpu.llm.early_stop import StreamingEarlyStop
from anorag_tpu.llm.factory import LLMFactory
from anorag_tpu.llm.local_llm import LocalLLM
from anorag_tpu.llm.multi_model import HybridLLMDispatcher, MultiModelClient, TaskClassifier
from anorag_tpu.llm.note_generator import AtomicNoteGenerator, normalize_predicate, stable_note_id
from anorag_tpu.llm.parallel_note_gen import ParallelAtomicNoteGenerator, ParallelTaskAtomicNoteGenerator
from anorag_tpu.llm.summary_auditor import SummaryAuditor
from anorag_tpu.graph.note_graph import NoteGraph


def ollama_transport(reply):
    def t(url, payload, timeout):
        assert "/api/generate" in url
        return {"response": reply(payload) if callable(reply) else reply}
    return t


def openai_transport(reply):
    def t(url, payload, timeout):
        assert "/chat/completions" in url
        content = reply(payload) if callable(reply) else reply
        return {"choices": [{"message": {"content": content}}]}
    return t


class FailingTransport:
    def __init__(self, fail_times=999):
        self.fail_times = fail_times
        self.calls = 0

    def __call__(self, url, payload, timeout):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise ConnectionError("endpoint down")
        return {"response": "ok", "choices": [{"message": {"content": "ok"}}]}


def test_clean_response_strips_think_tags():
    assert clean_response("<think>reasoning</think>  answer\x01") == "answer"


def test_with_retry():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 2:
            raise ValueError("x")
        return "done"

    assert with_retry(flaky, max_times=2, backoff=0) == "done"


def test_ollama_client_generate():
    c = OllamaClient(transport=ollama_transport("hello"))
    assert c.generate("hi") == "hello"
    assert c.stats["calls"] == 1


def test_lmstudio_pool_balances():
    c = LMStudioClient(instances=2, transport=openai_transport("x"))
    for _ in range(4):
        c.generate("q")
    stats = c.instance_stats()
    assert len(stats) == 2
    assert all(s["calls"] == 2 for s in stats)


def test_openai_client():
    c = OpenAIClient(transport=openai_transport("resp"))
    assert c.generate("q", system_prompt="sys") == "resp"


def test_factory_creation():
    c = LLMFactory.create_provider("ollama", {"model": "m"})
    assert isinstance(c, OllamaClient) and c.model == "m"
    with pytest.raises(ValueError):
        LLMFactory.create_provider("nope")


def test_multi_model_failover():
    bad = OllamaClient(transport=FailingTransport())
    good = OllamaClient(transport=ollama_transport("fine"))
    mm = MultiModelClient([bad, good], strategy="round_robin", max_retries=2)
    assert mm.generate("q") == "fine"
    stats = mm.pool_stats()
    assert any(not s["healthy"] for s in stats)


def test_multi_model_batch():
    mm = MultiModelClient([OllamaClient(transport=ollama_transport(
        lambda p: p["prompt"].upper()))])
    out = mm.batch_generate(["a", "b", "c"], max_workers=2)
    assert out == ["A", "B", "C"]


def test_task_classifier():
    tc = TaskClassifier()
    assert tc.classify_task("extract atomic note JSON from this") == "heavy"
    assert tc.classify_task("yes or no: is it red?") == "light"
    assert tc.classify_task("short", task_type="atomic_note") == "heavy"


def test_hybrid_dispatcher_routes_and_falls_back():
    light = OllamaClient(transport=ollama_transport("light-ans"))
    heavy = OllamaClient(transport=ollama_transport("heavy-ans"))
    d = HybridLLMDispatcher(light, heavy)
    assert d.generate("yes or no: x?") == "light-ans"
    assert d.generate("produce json atomic note") == "heavy-ans"
    # heavy fails -> falls back to light
    d2 = HybridLLMDispatcher(light, OllamaClient(transport=FailingTransport()))
    assert d2.generate("produce json atomic note") == "light-ans"


def test_local_llm_facade():
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")
    llm = LocalLLM(cfg=loader, transport=ollama_transport("out"))
    assert llm.generate("hi") == "out"
    assert llm.batch_generate(["a", "b"]) == ["out", "out"]


def test_early_stop_sentinel():
    es = StreamingEarlyStop()
    text, stopped = es.consume(iter(["~", "ignored", "tokens"]))
    assert stopped and text == "~"
    text2, stopped2 = es.consume(iter(["real ", "content"]))
    assert not stopped2 and text2 == "real content"


def _chunk():
    return {
        "doc_id": "d1", "chunk_index": 0, "title": "Doc Title",
        "paragraph_idx": 3,
        "text": "Aurora Lane performed Blue Horizon. The album sold a million copies.",
        "sentences": ["Aurora Lane performed Blue Horizon.",
                      "The album sold a million copies."],
    }


def _note_llm(notes_json):
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")
    return LocalLLM(cfg=loader, transport=ollama_transport(notes_json))


def test_note_generator_happy_path():
    reply = json.dumps([{
        "text": "Aurora Lane performed the song Blue Horizon.",
        "entities": ["Aurora Lane", "Blue Horizon"],
        "head_key": "Blue Horizon", "rel": "performed by", "tail_key": "Aurora Lane",
        "source_sent_ids": [0], "salience": 0.9,
    }])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert len(notes) == 1
    n = notes[0]
    assert n["rel"] == "performed_by"          # predicate normalized
    assert n["paragraph_idxs"][0] == 3          # chunk paragraph_idx leads
    assert n["raw_span"] == "Aurora Lane performed Blue Horizon."
    assert n["note_id"].startswith("note_")
    assert n["retrieval_method"] == "hybrid"


def test_note_generator_sentinel_fast_path():
    gen = AtomicNoteGenerator(_note_llm("~"), ConfigLoader(auto_load=False))
    assert gen.generate_atomic_notes([_chunk()]) == []
    assert gen.stats["sentinel_empty"] == 1


def test_note_generator_rule_fallback():
    gen = AtomicNoteGenerator(_note_llm("not json at all {{{"),
                              ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert notes  # rule fallback produced sentence notes
    assert gen.stats["rule_fallback"] == 1
    assert all(n["entities"] for n in notes)


def test_note_generator_sent_id_violation():
    reply = json.dumps([{"text": "A fabricated fact sentence here today.",
                         "source_sent_ids": [7], "salience": 0.9}])
    cfg = ConfigLoader(auto_load=False)
    cfg.set("notes_llm.grounding.enabled", False)  # isolate the sent_id path
    gen = AtomicNoteGenerator(_note_llm(reply), cfg)
    chunk = dict(_chunk(), sentence_ids=[0, 1])
    assert gen.generate_for_chunk(chunk) == []
    assert gen.stats["sent_id_violation"] == 1


def test_note_generator_grounding_drops_confabulated_entity():
    # Note asserts an entity with no close source surface -> that NOTE is
    # dropped (confabulation, not corruption); coverage holes are patched
    # extractively, so the chunk never falls back to rule notes.
    reply = json.dumps([{
        "text": "Crimson Dawn performed the song Blue Horizon.",
        "entities": ["Crimson Dawn", "Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.9,
    }])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["ungrounded_note"] == 1
    assert gen.stats["dropped_ungrounded_note"] >= 1
    assert gen.stats["augmented_note"] >= 1
    assert gen.stats["grounding_fallback"] == 0
    assert gen.stats["rule_fallback"] == 0
    assert notes and all("Crimson Dawn" not in n["content"] for n in notes)


def test_note_generator_grounding_reject_when_repair_disabled():
    # Round-3 behavior is still reachable: repair off -> whole chunk
    # output rejected, rule fallback takes over.
    reply = json.dumps([{
        "text": "Crimson Dawn performed the song Blue Horizon.",
        "entities": ["Crimson Dawn", "Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.9,
    }])
    cfg = ConfigLoader(auto_load=False)
    cfg.set("notes_llm.grounding.repair.enabled", False)
    gen = AtomicNoteGenerator(_note_llm(reply), cfg)
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["grounding_fallback"] == 1
    assert gen.stats["rule_fallback"] == 1
    assert notes and all("Crimson Dawn" not in n["content"] for n in notes)


def test_note_generator_grounding_snaps_corrupted_entity():
    # Byte-corrupted entity ("Aurora Lan") snaps to the source surface in
    # both the entities list and the note text — the dominant failure mode
    # of the byte-level distilled model.
    reply = json.dumps([{
        "text": "Aurora Lan performed the song Blue Horizon.",
        "entities": ["Aurora Lan", "Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.9,
    }, {
        "text": "The album sold a million copies.",
        "entities": [], "source_sent_ids": [1], "salience": 0.5,
    }])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["repaired_entity"] == 1
    assert gen.stats["grounding_repair_ok"] == 1
    assert gen.stats["grounding_fallback"] == 0
    assert any("Aurora Lane performed" in n["content"] for n in notes)
    assert all("Aurora Lan " not in n["content"] for n in notes)


def test_note_generator_grounding_augments_dropped_fact():
    # Notes ground OK but silently drop a chunk entity -> the missing
    # source sentence is added back as an extractive note.
    reply = json.dumps([{
        "text": "The album sold a million copies.",
        "entities": [],
        "source_sent_ids": [1], "salience": 0.5,
    }])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["uncovered_fact"] >= 1
    assert gen.stats["augmented_note"] >= 1
    assert gen.stats["grounding_fallback"] == 0
    assert any("Aurora Lane" in " ".join(n.get("entities") or [])
               for n in notes)


def test_note_generator_grounding_snaps_off_by_one_year():
    reply = json.dumps([{
        "text": "Blue Horizon was released in 1984.",
        "entities": ["Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.8,
    }])
    chunk = dict(_chunk(), text="Blue Horizon was released in 1983. "
                 "The album sold a million copies.",
                 sentences=["Blue Horizon was released in 1983.",
                            "The album sold a million copies."])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([chunk])
    assert gen.stats["repaired_year"] == 1
    assert gen.stats["grounding_fallback"] == 0
    assert any("1983" in n["content"] for n in notes)
    assert all("1984" not in n["content"] for n in notes)


def test_note_generator_grounding_accepts_complete_notes():
    reply = json.dumps([{
        "text": "Aurora Lane performed Blue Horizon.",
        "entities": ["Aurora Lane", "Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.9,
    }, {
        "text": "Blue Horizon (the album) sold a million copies.",
        "entities": ["Blue Horizon"],
        "source_sent_ids": [1], "salience": 0.6,
    }])
    gen = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["grounding_fallback"] == 0
    assert gen.stats["rule_fallback"] == 0
    assert notes  # per-paragraph quota may keep fewer than submitted


def test_parallel_task_generator_fallback():
    good = _note_llm(json.dumps([{
        "text": "Aurora Lane performed the song Blue Horizon.",
        "entities": ["Aurora Lane"], "source_sent_ids": [0], "salience": 0.9}]))
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")
    bad = LocalLLM(cfg=loader, transport=FailingTransport())
    gen = ParallelTaskAtomicNoteGenerator([bad, good], loader)
    notes = gen.generate_atomic_notes([_chunk(), _chunk()])
    assert notes  # bad endpoint's chunks recovered via good


def test_parallel_generator_quality_selection():
    rich = _note_llm(json.dumps([
        {"text": "Aurora Lane performed the song Blue Horizon.",
         "entities": ["Aurora Lane"], "source_sent_ids": [0], "salience": 0.9},
        {"text": "The album sold a million copies worldwide.",
         "entities": ["Blue Horizon"], "source_sent_ids": [1], "salience": 0.8},
    ]))
    poor = _note_llm("~")
    gen = ParallelAtomicNoteGenerator([poor, rich], ConfigLoader(auto_load=False),
                                      strategy="quality_selection")
    notes = gen.generate_atomic_notes([_chunk()])
    assert len(notes) >= 1


def test_cor_controller_converges():
    ng = NoteGraph()
    ng.add_notes([
        {"note_id": "n1", "text": "Blue Horizon is performed by Aurora Lane",
         "head_key": "Blue Horizon", "rel": "performed_by", "tail_key": "Aurora Lane"},
        {"note_id": "n2", "text": "Aurora Lane's spouse is Chris Reed",
         "head_key": "Aurora Lane", "rel": "spouse_of", "tail_key": "Chris Reed"},
    ])
    res = chain_of_retrieval("Who is the spouse of the performer of Blue Horizon?",
                             ng, max_rounds=3, confidence_tau=0.5)
    assert res["notes"]
    assert res["coverage"] > 0
    assert res["stopped_reason"] in ("confidence", "no_missing_entities", "max_rounds")


def test_summary_auditor_stage1_pass():
    a = SummaryAuditor()
    res = a.audit_note("Aurora Lane sang in Boston.",
                       {"note_id": "n", "content": "Aurora Lane sang in Boston.",
                        "entities": ["Aurora Lane", "Boston"]})
    assert not res["needs_rewrite"] and res["stage"] == 1


def test_summary_auditor_flags_missing():
    a = SummaryAuditor()  # no LLM -> rule verdict
    res = a.audit_note("Aurora Lane sang with Marcus Webb in Boston at Nexus Labs.",
                       {"note_id": "n", "content": "Someone sang.", "entities": []})
    assert res["needs_rewrite"]
    report = a.audit_batch([
        ("Aurora Lane sang with Marcus Webb in Boston at Nexus Labs.",
         {"note_id": "n", "content": "Someone sang.", "entities": []}),
    ])
    assert report["flagged"] == 1


def test_stable_ids_and_predicates():
    assert stable_note_id("d", 0, "x") == stable_note_id("d", 0, "x")
    assert normalize_predicate("married to") == "spouse_of"
    assert normalize_predicate(None) == "related_to"


def test_note_jsonl_writer_resume(tmp_path):
    from anorag_tpu.llm.notes_io import NoteJsonlWriter

    p = tmp_path / "notes.jsonl"
    with NoteJsonlWriter(p) as w:
        w.write({"note_id": "a", "content": "x"})
        w.write({"note_id": "b", "content": "y"})
    w2 = NoteJsonlWriter(p)
    assert w2.existing_ids() == {"a", "b"}
    w2.write({"note_id": "c", "content": "z"})
    w2.close()
    assert NoteJsonlWriter(p).existing_ids() == {"a", "b", "c"}


def test_notes_stats_logger():
    from anorag_tpu.llm.notes_io import NotesStatsLogger

    s = NotesStatsLogger()
    s.record_note({"doc_id": "d1", "entities": ["A"], "content": "hello world"})
    s.record_note({"doc_id": "d1", "entities": [], "content": "more text"})
    s.record_outcome("quality_filtered", 3)
    rep = s.report()
    assert rep["n_notes"] == 2 and rep["n_docs"] == 1
    assert rep["no_entity_ratio"] == 0.5
    assert rep["outcomes"]["quality_filtered"] == 3


def test_negation_guard_and_abbr_resolution():
    """v7 fixes: a negated cue must not forge an edge ('It was not
    released on Ramar Audio'), and facts keyed under a parenthetical
    abbreviation ('Denfen Music (DM) ... DM was started by F') re-key
    under the full name in the corpus-level alias pass."""
    from anorag_tpu.llm.note_generator import (extract_all_note_keys,
                                               resolve_note_abbreviations)

    # negation: the only cue is negated -> no released_on_label edge
    k = extract_all_note_keys(
        "Baba River was not released on Ramar Audio.",
        ["Baba River", "Ramar Audio"])
    assert not (k.get("rel") == "released_on_label"
                and k.get("tail_key") == "Ramar Audio")
    # the positive fact next to a negated foil still extracts
    k = extract_all_note_keys(
        "Baba River was released in 2008 on the label Pricor Audio. "
        "Baba River was not released on Ramar Audio.",
        ["Baba River", "2008", "Pricor Audio", "Ramar Audio"])
    triples = {(k["head_key"], k["rel"], k["tail_key"])} | {
        (s["head_key"], s["rel"], s["tail_key"])
        for s in k.get("secondary_keys") or ()}
    assert ("Baba River", "released_on_label", "Pricor Audio") in triples
    assert ("Baba River", "released_on_label", "Ramar Audio") not in triples

    notes = [
        {"text": "Denfen Music (DM) is a record label.",
         "entities": ["Denfen Music", "DM"]},
        {"text": "DM was started by Lincorne Linprilin.",
         "entities": ["DM", "Lincorne Linprilin"],
         "head_key": "DM", "rel": "founded_by",
         "tail_key": "Lincorne Linprilin",
         "secondary_keys": [{"head_key": "Lincorne Linprilin",
                             "rel": "member_of", "tail_key": "DM"}]},
    ]
    resolve_note_abbreviations(notes)
    assert notes[1]["head_key"] == "Denfen Music"
    assert notes[1]["secondary_keys"][0]["tail_key"] == "Denfen Music"
    assert "Denfen Music" in notes[1]["entities"]  # both surfaces retrievable
    assert "DM" in notes[1]["entities"]


def test_rule_fallback_topic_coref_and_multi_triple():
    """v5 fixes: a neuter 'It' resolves to the paragraph TOPIC (recovered
    from a title-shaped first sentence — chunkers fold the paragraph title
    into the text), not to the running subject ('P recorded the album W.
    It was put out ...' must key W, not P); merged multi-sentence notes
    carry EVERY sentence's triple via secondary_keys; and the entity regex
    cannot bridge a sentence boundary ('W. W' is not one entity)."""
    from anorag_tpu.config import ConfigLoader
    from anorag_tpu.llm.note_generator import AtomicNoteGenerator
    from anorag_tpu.utils.text import extract_entities_fallback

    gen = AtomicNoteGenerator(_note_llm("not json {{{"),
                              ConfigLoader(auto_load=False))
    sents = ["Gorza Mosaic (album).",
             "Baneden Bavel recorded the album Gorza Mosaic.",
             "It was put out in 1967 by the label Bakes Audio."]
    notes = gen.generate_for_chunk({"doc_id": "d", "chunk_index": 0,
                                    "text": " ".join(sents),
                                    "sentences": sents,
                                    "paragraph_idx": 0})
    triples = set()
    for n in notes:
        if n.get("head_key"):
            triples.add((n["head_key"], n["rel"], n["tail_key"]))
        for sk in n.get("secondary_keys") or ():
            triples.add((sk["head_key"], sk["rel"], sk["tail_key"]))
    assert ("Gorza Mosaic", "performed_by", "Baneden Bavel") in triples
    assert ("Gorza Mosaic", "released_on_label", "Bakes Audio") in triples
    assert ("Gorza Mosaic", "released_in", "1967") in triples
    # no person-headed label/year triples (the old coref bug)
    assert not any(h == "Baneden Bavel" and r != "performed_by"
                   for h, r, _t in triples)
    # sentence-bounded entity spans
    ents = extract_entities_fallback(
        "Baneden Bavel recorded the album Gorza Mosaic. "
        "Gorza Mosaic was put out in 1967.")
    assert "Gorza Mosaic" in ents
    assert all(". " not in e for e in ents)


# ----------------------------------------------------- batched note path
def _mixed_transport(replies):
    """Transport returning reply i for call i (ollama wire shape)."""
    calls = {"n": 0}

    def transport(url, payload, timeout):
        i = min(calls["n"], len(replies) - 1)
        calls["n"] += 1
        return {"response": replies[i]}

    return transport


def test_batched_notes_match_sequential():
    """The batched path must produce byte-identical notes to the
    per-chunk loop for the same replies."""
    reply = json.dumps([{
        "text": "Aurora Lane performed the song Blue Horizon.",
        "entities": ["Aurora Lane", "Blue Horizon"],
        "source_sent_ids": [0], "salience": 0.9,
    }])
    chunks = [_chunk(), dict(_chunk(), chunk_index=1, paragraph_idx=5)]
    seq_cfg = ConfigLoader(auto_load=False)
    seq_cfg.set("notes_llm.batch.enabled", False)
    seq = AtomicNoteGenerator(_note_llm(reply), seq_cfg)
    seq_notes = seq.generate_atomic_notes(chunks)
    bat = AtomicNoteGenerator(_note_llm(reply), ConfigLoader(auto_load=False))
    bat_notes = bat.generate_atomic_notes(chunks)
    assert seq_notes == bat_notes and len(bat_notes) == 2


def test_batched_notes_mixed_outcomes():
    """One sentinel chunk, one parse-fail chunk (retry also fails ->
    rule fallback), in a single batch round."""
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")
    llm = LocalLLM(cfg=loader,
                   transport=_mixed_transport(["~", "{{{ not json", "still bad"]))
    gen = AtomicNoteGenerator(llm, ConfigLoader(auto_load=False))
    chunks = [_chunk(), dict(_chunk(), chunk_index=1)]
    notes = gen.generate_atomic_notes(chunks)
    assert gen.stats["sentinel_empty"] == 1
    assert gen.stats["parse_fail"] == 1
    assert gen.stats["rule_fallback"] == 1
    assert notes and all(n["chunk_index"] == 1 for n in notes)


def test_batched_notes_retry_recovers():
    """Parse failure recovered by the batched shortened-chunk retry."""
    good = json.dumps([{"text": "Aurora Lane performed Blue Horizon today.",
                        "entities": ["Aurora Lane"], "source_sent_ids": [0],
                        "salience": 0.8}])
    loader = ConfigLoader(auto_load=False)
    loader.set("llm.provider", "ollama")
    llm = LocalLLM(cfg=loader, transport=_mixed_transport(["broken {", good]))
    gen = AtomicNoteGenerator(llm, ConfigLoader(auto_load=False))
    notes = gen.generate_atomic_notes([_chunk()])
    assert gen.stats["parse_retry_ok"] == 1
    assert len(notes) == 1 and gen.stats.get("rule_fallback", 0) == 0
