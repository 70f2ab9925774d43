"""Foundation utils: text, json parsing, padding, file io."""
import numpy as np

from anorag_tpu.utils import file_io, json_parser, padding, text


def test_tokenize_matches_bm25_contract():
    assert text.tokenize("Hello, World! it's 2024") == ["hello", "world", "it", "s", "2024"]


def test_sentence_split():
    sents = text.split_sentences("First sentence. Second one! Third?")
    assert len(sents) == 3


def test_entity_fallback():
    ents = text.extract_entities_fallback('Aurora Lane sang "Blue Horizon" in 1999.')
    assert "Aurora Lane" in ents
    assert "Blue Horizon" in ents
    assert "1999" in ents


def test_entity_connectors_are_infix_only():
    # regression: "de" must not match the first two chars of "designed";
    # entities never end on a connector word
    ents = text.extract_entities_fallback("Gustave Eiffel designed the Eiffel Tower.")
    assert "Gustave Eiffel" in ents
    assert not any(e.endswith(" de") or e.endswith(" of") for e in ents)
    ents2 = text.extract_entities_fallback("Ludwig van Beethoven visited the Statue of Liberty.")
    assert "Ludwig van Beethoven" in ents2
    assert any("Statue of Liberty" in e for e in ents2)


def test_normalize_answer():
    assert text.normalize_answer("The  Blue-Horizon!") == "blue horizon"


def test_note_embedding_text():
    note = {"title": "T", "content": "C", "entities": ["E1", "E2"]}
    s = text.note_embedding_text(note)
    assert s == "T || C || ENTITIES: E1, E2"


def test_json_extraction_fenced():
    out = json_parser.extract_json('prose...\n```json\n{"a": 1,}\n```\nmore')
    assert out == {"a": 1}


def test_json_extraction_embedded_list():
    out = json_parser.extract_json('Sure! Here: [{"x": "y"}] trailing')
    assert out == [{"x": "y"}]


def test_json_extraction_salvages_truncated_list():
    # A bounded generation budget cuts note lists mid-object; complete
    # leading objects must survive (llm_notes mode: 163/1150 generations
    # were lost to exactly this truncation at max_new=512).
    out = json_parser.extract_json(
        '[{"text": "A did B.", "entities": ["A"]},'
        '{"text": "C did D.", "entities": ["C"]},'
        '{"text": "E did')
    assert out == [{"text": "A did B.", "entities": ["A"]},
                   {"text": "C did D.", "entities": ["C"]}]
    # truncated INSIDE a string (escape state must not leak)
    out = json_parser.extract_json(
        '[{"a": 1}, {"b": "unterminated \\" str')
    assert out == [{"a": 1}]
    # a properly closed list is not "salvaged" differently
    assert json_parser.extract_json('[{"a": 1}]') == [{"a": 1}]
    # no complete object -> still None
    assert json_parser.extract_json('[{"a": ') is None


def test_json_extraction_closes_object_truncated_mid_value():
    # Generation budget cut INSIDE the first object (the measured failure
    # of the distilled note LM at max_new=512: merged note + secondary
    # keys overflow): complete leading fields must survive.
    out = json_parser.extract_json(
        '[{"text":"M is an album by G. Released in 1960 on F.",'
        '"entities":["M","G","F","1960"],"source_sent_ids":[0,1,2],'
        '"salience":0.6,"head_key":"M","rel":"performed_by",'
        '"tail_key":"G","secondary_keys":[{"head_key":"M",'
        '"rel":"released_on_label","tail_key":"F"},'
        '{"head_key":"M","rel":"released_in","tail_key":"19')
    assert isinstance(out, list) and len(out) == 1
    note = out[0]
    assert note["text"] == "M is an album by G. Released in 1960 on F."
    assert note["entities"] == ["M", "G", "F", "1960"]
    assert note["head_key"] == "M"
    assert note["secondary_keys"][0]["tail_key"] == "F"
    # truncated mid-number
    out = json_parser.extract_json('[{"text":"ok fact.","salience":0.')
    assert isinstance(out, list) and out[0]["text"] == "ok fact."
    # dict truncated mid-string (answer task)
    out = json_parser.extract_json(
        '{"answer":"Boston","evidence_spans":["A was born in Bos')
    assert out == {"answer": "Boston"} or out == {
        "answer": "Boston", "evidence_spans": []}


def test_json_retry():
    calls = []

    def retry():
        calls.append(1)
        return '{"ok": true}'

    out = json_parser.extract_json_with_retry("not json at all {{{", retry_fn=retry)
    assert out == {"ok": True} and calls


def test_pad_ragged():
    mat, lens = padding.pad_ragged([[1, 2, 3], [], [4]], pad_value=-1, width_multiple=4)
    assert mat.shape == (3, 4)
    assert mat[0].tolist() == [1, 2, 3, -1]
    assert lens.tolist() == [3, 0, 1]
    mask = padding.mask_from_lengths(lens, 4)
    assert mask.sum() == 4


def test_work_dirs(tmp_path):
    w1 = file_io.next_work_dir(tmp_path / "result")
    w2 = file_io.next_work_dir(tmp_path / "result")
    assert w1.name == "1" and w2.name == "2"
    assert file_io.latest_work_dir(tmp_path / "result").name == "2"


def test_jsonl_roundtrip_and_sha(tmp_path):
    rows = [{"a": 1}, {"b": np.float32(2.5)}]
    p = tmp_path / "x.jsonl"
    file_io.write_jsonl(p, rows)
    back = file_io.read_jsonl(p)
    assert back[0] == {"a": 1} and back[1]["b"] == 2.5
    assert file_io.jsonl_sha1(back) == file_io.file_sha1(p)


def test_config_hash_stable():
    h1 = file_io.config_hash({"b": 1, "a": [1, 2]})
    h2 = file_io.config_hash({"a": [1, 2], "b": 1})
    assert h1 == h2
