"""HTTP serving layer: /healthz, /search, /query, error handling."""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.models.embedding_manager import EmbeddingManager
from anorag_tpu.query.processor import QueryProcessor

import serve as serve_mod

from conftest import make_notes


@pytest.fixture(scope="module")
def server():
    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 64)
    cfg.set("vector_store.index_type", "Flat")
    qp = QueryProcessor(make_notes(12), cfg=cfg,
                        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), serve_mod.make_handler(qp))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["n_notes"] == 12


def test_search_endpoint(server):
    code, body = _post(server + "/search", {"query": "Aurora Lane Blue Horizon", "top_k": 3})
    assert code == 200
    assert body["notes"]
    assert "Blue Horizon" in body["notes"][0]["content"] or \
           "Aurora Lane" in body["notes"][0]["content"]


def test_query_endpoint(server):
    code, body = _post(server + "/query", {"query": "Who is the director of Silent River?"})
    assert code == 200
    assert "answer" in body and "predicted_support_idxs" in body
    assert body["notes"]


def test_bad_requests(server):
    code, body = _post(server + "/query", {})
    assert code == 400 and "query" in body["error"]
    req = urllib.request.Request(server + "/query", data=b"not json",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 400
    code, _ = _post(server + "/nope", {"query": "x"})
    assert code == 404


def test_query_batch_endpoint(server):
    code, body = _post(server + "/query_batch", {
        "queries": ["Who is the director of Silent River?",
                    "Who founded Nexus Labs?"],
        "top_k": 5,
    })
    assert code == 200 and len(body["results"]) == 2
    assert all("answer" in r for r in body["results"])
    code, body = _post(server + "/query_batch", {"queries": []})
    assert code == 400


def test_query_batch_streams_large_requests(server):
    """> serving.stream_batch queries run the pipelined process_stream path;
    results must come back complete, in order, and identical in shape."""
    qs = ["Who is the director of Silent River?",
          "Who founded Nexus Labs?"] * 40   # 80 > default stream_batch 64
    code, body = _post(server + "/query_batch", {"queries": qs, "top_k": 5})
    assert code == 200 and len(body["results"]) == 80
    assert [r["query"] for r in body["results"]] == qs
    # same question => same answer whether it went through stream or batch
    assert body["results"][0]["answer"] == body["results"][78]["answer"]


def test_concurrent_clients(server):
    """Parallel requests against the threaded server: every client gets a
    complete, correct response (the per-processor lock serializes safely)."""
    import concurrent.futures as cf

    def hit(i):
        if i % 3 == 0:
            return _post(server + "/query",
                         {"query": "Who founded Nexus Labs?"})
        if i % 3 == 1:
            return _post(server + "/search",
                         {"query": "Silent River", "top_k": 2})
        return _post(server + "/query_batch",
                     {"queries": ["Who is the director of Silent River?"],
                      "top_k": 3})

    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        results = list(ex.map(hit, range(12)))
    assert all(code == 200 for code, _ in results)
    answers = [b.get("answer") for code, b in results if "answer" in b]
    assert answers and all(a for a in answers)


@pytest.fixture(scope="module")
def engine_server():
    """Server wired through the ServingEngine (the production path):
    cross-request pipelining via the dispatcher thread."""
    from anorag_tpu.serving import ServingEngine

    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 64)
    cfg.set("vector_store.index_type", "Flat")
    qp = QueryProcessor(make_notes(12), cfg=cfg,
                        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False))
    engine = ServingEngine(qp, sub_batch=4, depth=3, host_workers=1)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              serve_mod.make_handler(qp, engine))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    engine.close()


def test_engine_batch_ordering(engine_server):
    """A batch larger than sub_batch splits into pipelined chunks and
    reassembles in request order with correct answers."""
    qs = ["Who is the director of Silent River?",
          "Who founded Nexus Labs?"] * 5   # 10 > sub_batch 4
    code, body = _post(engine_server + "/query_batch", {"queries": qs, "top_k": 5})
    assert code == 200 and len(body["results"]) == 10
    assert [r["query"] for r in body["results"]] == qs
    assert body["results"][0]["answer"] == body["results"][8]["answer"]


def test_engine_concurrent_requests(engine_server):
    """Parallel requests pipeline through the one dispatcher: every client
    gets complete, correct, correctly-ordered results."""
    import concurrent.futures as cf

    def hit(i):
        if i % 2 == 0:
            return _post(engine_server + "/query",
                         {"query": "Who founded Nexus Labs?"})
        return _post(engine_server + "/query_batch",
                     {"queries": ["Who is the director of Silent River?"] * 6,
                      "top_k": 3})

    with cf.ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(hit, range(16)))
    assert all(code == 200 for code, _ in results)
    for code, b in results:
        if "results" in b:
            assert len(b["results"]) == 6
            assert len({r["answer"] for r in b["results"]}) == 1


def test_engine_direct_api():
    """ServingEngine directly: futures resolve in order; empty requests and
    post-close submissions behave."""
    from anorag_tpu.serving import ServingEngine

    cfg = ConfigLoader(auto_load=False)
    cfg.set("embedding.backend", "hash")
    cfg.set("embedding.dim", 64)
    cfg.set("vector_store.index_type", "Flat")
    qp = QueryProcessor(make_notes(8), cfg=cfg,
                        embedding_manager=EmbeddingManager(cfg=cfg, singleton=False))
    engine = ServingEngine(qp, sub_batch=2, depth=2)
    try:
        futs = [engine.submit(["Who founded Nexus Labs?"] * 3) for _ in range(4)]
        for f in futs:
            rows = f.result(timeout=60)
            assert len(rows) == 3
            assert all(r["answer"] for r in rows)
        assert engine.process([]) == []
    finally:
        engine.close()
    with pytest.raises(RuntimeError):
        engine.submit(["x"])
