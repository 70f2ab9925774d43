"""CLI work-dir semantics (ref main.py:281-298): `process` reuses the
latest work dir by default (so incremental/artifact caches apply across
runs), --new forces a fresh numbered dir, --force reprocesses."""
import argparse
import json

import yaml


def _write_corpus(path):
    with open(path, "w") as fh:
        for i in range(6):
            fh.write(json.dumps({
                "id": f"d{i}", "title": f"Doc {i}",
                "text": f"Person {i} created Thing {i}. It happened in {1990 + i}.",
            }) + "\n")


def _cfg_file(tmp_path):
    cfg = {
        "embedding": {"backend": "hash", "dim": 64},
        "vector_store": {"index_type": "Flat"},
        "system": {"device": "cpu"},
        "storage": {"result_root": str(tmp_path / "result")},
    }
    p = tmp_path / "config.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def _args(cfg, files, **kw):
    base = dict(config=cfg, files=files, new=False, force=False, debug=False,
                parallel=False, workers=1, strategy="hybrid", no_llm=True)
    base.update(kw)
    return argparse.Namespace(**base)


def test_process_reuses_then_new_dir(tmp_path, monkeypatch):
    import main as main_mod

    cfg = _cfg_file(tmp_path)
    corpus = tmp_path / "corpus.jsonl"
    _write_corpus(corpus)

    assert main_mod.process_docs(_args(cfg, [str(corpus)])) == 0
    root = tmp_path / "result"
    first = sorted(p.name for p in root.iterdir() if p.is_dir())
    assert len(first) == 1

    # default: reuse the latest dir (caches apply), no new dir created
    assert main_mod.process_docs(_args(cfg, [str(corpus)])) == 0
    assert sorted(p.name for p in root.iterdir() if p.is_dir()) == first

    # --new: a fresh numbered dir
    assert main_mod.process_docs(_args(cfg, [str(corpus)], new=True)) == 0
    dirs = sorted(p.name for p in root.iterdir() if p.is_dir())
    assert len(dirs) == 2

    # --force on the reused dir REBUILDS artifacts (regression: force once
    # only refreshed the incremental plan while ArtifactStore still served
    # every cached stage) — manifest mtimes must advance
    import time

    latest = root / dirs[-1]
    manifests = sorted(latest.glob("*.manifest.json"))
    assert manifests, "artifact manifests missing"
    before = {m.name: m.stat().st_mtime_ns for m in manifests}
    time.sleep(0.01)
    assert main_mod.process_docs(_args(cfg, [str(corpus)], force=True)) == 0
    after = {m.name: m.stat().st_mtime_ns for m in manifests}
    assert all(after[n] > before[n] for n in before), "force did not rebuild"
    # and a plain rerun afterwards is a cache hit again (mtimes unchanged)
    assert main_mod.process_docs(_args(cfg, [str(corpus)])) == 0
    assert {m.name: m.stat().st_mtime_ns for m in manifests} == after
    assert (latest / "atomic_notes.json").exists()
