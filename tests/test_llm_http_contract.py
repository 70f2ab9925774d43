"""HTTP-level LLM contract tests: the full client stack (transport, wire
parsing, cleaning, retry, health, pool failover, note-generation
parse/retry/shorten) driven through REAL sockets against fake Ollama /
LM Studio / OpenAI servers (tests/fake_llm_server.py). Replaces the
round-1 'mock transport only' coverage (ref llm/ollama_client.py:18-377,
lmstudio_client.py:24-484, multi_model_client.py:354-487)."""
import json
import time

import pytest

from anorag_tpu.config import ConfigLoader
from anorag_tpu.llm.base import with_retry
from anorag_tpu.llm.clients import LMStudioClient, OllamaClient, OpenAIClient
from anorag_tpu.llm.local_llm import LocalLLM
from anorag_tpu.llm.multi_model import MultiModelClient
from tests.fake_llm_server import Behavior, FakeLLMServer


# ----------------------------------------------------------------- ollama
def test_ollama_wire_roundtrip():
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("ok", text="  <think>chain of thought</think>Paris\x07  "))
        c = OllamaClient(base_url=srv.url, model="qwen2.5:latest", timeout=5)
        out = c.generate("capital of France?", system_prompt="be terse",
                         max_tokens=32, stop=["\n\n"])
        assert out == "Paris"  # think-tags + control chars cleaned
        req = srv.requests[0]
        assert req["path"] == "/api/generate"
        assert req["payload"]["model"] == "qwen2.5:latest"
        assert req["payload"]["system"] == "be terse"
        assert req["payload"]["options"]["num_predict"] == 32
        assert req["payload"]["options"]["stop"] == ["\n\n"]
        assert req["payload"]["stream"] is False


def test_ollama_malformed_json_raises_and_counts():
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("malformed"))
        c = OllamaClient(base_url=srv.url, timeout=5)
        with pytest.raises(Exception):
            c.generate("hi")
        assert c.stats["errors"] == 1


def test_ollama_http_500_then_retry_recovers():
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("http_error", status=500), Behavior("ok", text="ok now"))
        c = OllamaClient(base_url=srv.url, timeout=5)
        out = with_retry(lambda: c.generate("hi"), max_times=1, backoff=0.01)
        assert out == "ok now"
        assert len(srv.requests) == 2
        assert c.stats["errors"] == 1 and c.stats["calls"] == 2


def test_ollama_timeout_surfaces_as_error():
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("slow", text="late", delay=2.0))
        c = OllamaClient(base_url=srv.url, timeout=0.3)
        t0 = time.time()
        with pytest.raises(Exception):
            c.generate("hi")
        assert time.time() - t0 < 1.5  # timed out, did not wait the full delay


def test_ollama_availability_probe():
    with FakeLLMServer("ollama") as srv:
        c = OllamaClient(base_url=srv.url, timeout=5)
        assert c.is_available()
        url = srv.url
    # server closed: same address now refuses connections
    dead = OllamaClient(base_url=url, timeout=0.5)
    assert not dead.is_available()


def test_ollama_empty_response_field():
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("empty_choices"))
        c = OllamaClient(base_url=srv.url, timeout=5)
        assert c.generate("hi") == ""


# ------------------------------------------------- openai-compatible wire
def test_lmstudio_wire_and_empty_choices():
    with FakeLLMServer("openai") as srv:
        c = LMStudioClient(base_url=srv.url, model="qwen2.5-7b-instruct", timeout=5)
        out = c.generate("ping", system_prompt="sys")
        assert out == "pong"
        req = srv.requests[0]
        assert req["path"] == "/chat/completions"
        assert req["payload"]["messages"][0] == {"role": "system", "content": "sys"}
        srv.queue(Behavior("empty_choices"))
        assert c.generate("ping") == ""


def test_lmstudio_pool_error_accounting():
    with FakeLLMServer("openai") as srv:
        srv.queue(Behavior("http_error"))
        c = LMStudioClient(base_url=srv.url, timeout=5, instances=1)
        with pytest.raises(Exception):
            c.generate("hi")
        stats = c.instance_stats()
        assert stats[0]["errors"] == 1 and stats[0]["in_flight"] == 0


def test_openai_bearer_auth_header_on_real_socket():
    with FakeLLMServer("openai") as srv:
        c = OpenAIClient(base_url=srv.url, model="gpt-3.5-turbo",
                         timeout=5, api_key="sk-test-123")
        assert c.generate("hi") == "pong"
        hdrs = srv.requests[0]["headers"]
        assert hdrs.get("Authorization") == "Bearer sk-test-123"


# -------------------------------------------------------- pool / failover
def test_multi_model_failover_across_real_servers():
    with FakeLLMServer("ollama") as bad, FakeLLMServer("ollama") as good:
        bad.default = Behavior("http_error")
        good.default = Behavior("ok", text="from-good")
        c1 = OllamaClient(base_url=bad.url, timeout=5)
        c2 = OllamaClient(base_url=good.url, timeout=5)
        pool = MultiModelClient([c1, c2], strategy="round_robin", max_retries=1)
        outs = {pool.generate("q") for _ in range(4)}
        assert outs == {"from-good"}
        stats = {s["provider"]: s for s in pool.pool_stats()}
        # the failing client was marked unhealthy after its first error
        assert c1.stats["errors"] >= 1
        assert any(not s["healthy"] for s in pool.pool_stats())


def test_multi_model_health_thread_recovers_marked_down_client():
    with FakeLLMServer("ollama") as a, FakeLLMServer("ollama") as b:
        a.default = Behavior("ok", text="A")
        b.default = Behavior("ok", text="B")
        c1 = OllamaClient(base_url=a.url, timeout=2)
        c2 = OllamaClient(base_url=b.url, timeout=2)
        pool = MultiModelClient([c1, c2], health_check_interval=0.1)
        try:
            pool._healthy[id(c1)] = False  # simulate an earlier failure
            time.sleep(0.4)                # health loop probes the real socket
            assert pool._healthy[id(c1)]
        finally:
            pool.close()


# --------------------------------------- LocalLLM + note-generation loop
def _llm_cfg(url: str) -> ConfigLoader:
    cfg = ConfigLoader(auto_load=False)
    cfg.set("llm.provider", "ollama")
    cfg.set("llm.model", "qwen2.5:latest")
    cfg.set("llm.ollama.base_url", url)
    cfg.set("llm.ollama.timeout", 5)
    cfg.set("retry.max_times", 1)
    return cfg


def test_local_llm_through_config_and_socket():
    with FakeLLMServer("ollama") as srv:
        llm = LocalLLM(cfg=_llm_cfg(srv.url))
        assert llm.is_available()
        srv.queue(Behavior("ok", text="socket says hi"))
        assert llm.generate("hello") == "socket says hi"


def test_note_generation_parse_retry_shorten_over_socket():
    """First response is broken JSON -> generator retries with a SHORTENED
    chunk prompt; second response parses (ref atomic note retry loop)."""
    from anorag_tpu.llm.note_generator import AtomicNoteGenerator

    good = json.dumps([{
        "text": "Ada Lovelace worked with Charles Babbage.",
        "entities": ["Ada Lovelace", "Charles Babbage"],
        "source_sent_ids": [0], "salience": 0.9,
    }])
    with FakeLLMServer("ollama") as srv:
        srv.queue(Behavior("ok", text="NOT JSON {{{"), Behavior("ok", text=good))
        cfg = _llm_cfg(srv.url)
        cfg.set("retry.max_times", 0)
        cfg.set("notes_llm.retry_once_on_parse_error", True)
        gen = AtomicNoteGenerator(llm=LocalLLM(cfg=cfg), cfg=cfg)
        chunk = {"chunk_id": "c0", "doc_id": "d0",
                 "text": "Ada Lovelace worked with Charles Babbage. " * 60}
        notes = gen.generate_for_chunk(chunk)
        assert len(srv.requests) == 2  # original + shortened retry
        p1 = srv.requests[0]["payload"]["prompt"]
        p2 = srv.requests[1]["payload"]["prompt"]
        assert len(p2) < len(p1)       # retry prompt was shortened
        assert notes and notes[0]["content"] == "Ada Lovelace worked with Charles Babbage."
        assert "Ada Lovelace" in notes[0]["entities"]
        assert gen.stats["parse_retry_ok"] == 1
