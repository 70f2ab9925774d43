"""Config system: defaults, merge, aliases, deprecation, dot-paths."""
import yaml

from anorag_tpu.config import ConfigLoader, default_config, deep_merge, get_path, set_path


def test_defaults_complete():
    cfg = default_config()
    assert cfg["retrieval"]["hybrid"]["weights"]["dense"] == 1.0
    assert cfg["hybrid_search"]["lexical_fallback"]["miss_penalty"] == 0.6
    assert cfg["vector_store"]["dimension"] == 1024
    assert cfg["tpu"]["mesh"]["data_axis"] == "data"


def test_deep_merge_preserves_defaults():
    merged = deep_merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert merged == {"a": {"b": 9, "c": 2}}


def test_yaml_merge_and_dot_path(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump({"retrieval": {"candidate_pool": 80}}))
    loader = ConfigLoader(config_path=str(p))
    assert loader.get("retrieval.candidate_pool") == 80
    # untouched defaults survive
    assert loader.get("retrieval.hybrid.rrf_k") == 60
    loader.set("retrieval.hybrid.rrf_k", 10)
    assert loader.get("retrieval.hybrid.rrf_k") == 10


def test_unknown_key_reporting(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump({"retrieval": {"no_such_knob": 1}}))
    loader = ConfigLoader(config_path=str(p))
    assert "retrieval.no_such_knob" in loader.report()["unknown_keys"]


def test_alias_sync_legacy_to_new(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump({"dispatcher": {"final_semantic_count": 11}}))
    loader = ConfigLoader(config_path=str(p))
    assert loader.get("context_dispatcher.final_semantic_count") == 11


def test_alias_sync_new_wins(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        yaml.safe_dump(
            {
                "dispatcher": {"final_semantic_count": 11},
                "context_dispatcher": {"final_semantic_count": 13},
            }
        )
    )
    loader = ConfigLoader(config_path=str(p))
    assert loader.get("dispatcher.final_semantic_count") == 13
    assert loader.get("context_dispatcher.final_semantic_count") == 13


def test_get_set_path_helpers():
    d = {}
    set_path(d, "a.b.c", 5)
    assert get_path(d, "a.b.c") == 5
    assert get_path(d, "a.x", "dflt") == "dflt"


def test_missing_file_ok(tmp_path):
    loader = ConfigLoader(config_path=str(tmp_path / "absent.yaml"))
    assert loader.get("system.seed") == 42
