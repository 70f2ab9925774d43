"""The in-framework LLM server (scripts/serve_llm.py) through the real
HTTP client stack: the framework's OllamaClient / OpenAIClient against a
live in-process server wrapping a REAL decoder-LM checkpoint — the only
coverage where the wire formats meet actual model output (the fake-server
contract tests stub the payloads).

Parity rationale: the reference's clients talk to external Ollama /
LM Studio servers (/root/reference/llm/ollama_client.py:18-377); here
the server is first-party, so the whole loop is testable in-image.
"""
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import pytest

CKPT = Path(__file__).resolve().parents[1] / "checkpoints" / "note_lm_cpu_small"

pytestmark = pytest.mark.skipif(
    not (CKPT / "params.npz").exists(),
    reason="smoke checkpoint not present")


@pytest.fixture(scope="module")
def llm_server():
    from scripts.serve_llm import MicroBatcher, make_handler
    from anorag_tpu.models.decoder_lm import DecoderLM, load_lm

    params, cfg = load_lm(str(CKPT))
    lm = DecoderLM(params, cfg, prompt_bucket=cfg.max_len // 2)
    batcher = MicroBatcher(lm, max_batch=4, max_new=48, window_s=0.02)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(batcher, "note-lm"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", batcher
    srv.shutdown()


def test_ollama_client_against_real_server(llm_server):
    from anorag_tpu.llm.clients import OllamaClient

    url, _ = llm_server
    c = OllamaClient(base_url=url, model="note-lm", timeout=120)
    assert c.is_available()            # health ping short-circuits
    out = c.generate("Aurora Lane recorded Blue Horizon.",
                     system_prompt="Generate atomic notes.", max_tokens=8)
    assert isinstance(out, str)        # real model bytes, no transport error
    assert c.stats["errors"] == 0


def test_openai_client_against_real_server(llm_server):
    from anorag_tpu.llm.clients import OpenAIClient

    url, _ = llm_server
    c = OpenAIClient(base_url=f"{url}/v1", model="note-lm", timeout=120)
    out = c.generate("Marcus Webb released Silent River.",
                     system_prompt="notes", max_tokens=8)
    assert isinstance(out, str)
    assert c.stats["errors"] == 0


def test_microbatch_groups_concurrent_requests(llm_server):
    """N concurrent requests must complete in fewer device batches."""
    url, batcher = llm_server
    b0 = batcher.stats["batches"]

    def post():
        payload = {"model": "note-lm", "prompt": "Elena Cortez sang.",
                   "options": {"num_predict": 8}}
        req = urllib.request.Request(
            f"{url}/api/generate", json.dumps(payload).encode(),
            {"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=120).read()

    threads = [threading.Thread(target=post) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    made = batcher.stats["batches"] - b0
    assert made < 4, f"no batching happened ({made} batches for 4 reqs)"


def test_bad_json_and_unknown_route(llm_server):
    url, _ = llm_server
    req = urllib.request.Request(f"{url}/api/generate", b"{not json",
                                 {"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    req = urllib.request.Request(f"{url}/nope", b"{}",
                                 {"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 404
