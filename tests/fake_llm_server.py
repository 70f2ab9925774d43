"""In-process fake LLM HTTP servers speaking the Ollama / LM Studio /
OpenAI wire formats — including malformed JSON, think-tags, slow
responses, and 5xx errors — so the client stack is exercised through real
sockets (ref llm/ollama_client.py:18-377, lmstudio_client.py:24-484,
openai_client.py:17-297)."""
from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional


class Behavior:
    """One scripted response. kind:
    ok            — well-formed provider response with `text`
    malformed     — HTTP 200 but invalid JSON body
    http_error    — 5xx with a JSON error body
    empty_choices — valid JSON, no choices/response field
    slow          — sleep `delay` seconds before the ok response
    """

    def __init__(self, kind: str = "ok", text: str = "pong", delay: float = 0.0,
                 status: int = 500):
        self.kind = kind
        self.text = text
        self.delay = delay
        self.status = status


class FakeLLMServer:
    """One provider endpoint. `protocol` = 'ollama' | 'openai'.

    Responses come from a FIFO script when one is queued, else the
    `default` behavior repeats. Records every request (path, payload,
    headers) for assertions.
    """

    def __init__(self, protocol: str = "ollama",
                 default: Optional[Behavior] = None):
        self.protocol = protocol
        self.default = default or Behavior()
        self.script: List[Behavior] = []
        self.requests: List[Dict[str, Any]] = []
        self._lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                pass

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                try:
                    payload = json.loads(raw or b"{}")
                except Exception:
                    payload = {"_raw": raw.decode("utf-8", "replace")}
                with outer._lock:
                    outer.requests.append({
                        "path": self.path, "payload": payload,
                        "headers": {k: v for k, v in self.headers.items()},
                    })
                    beh = outer.script.pop(0) if outer.script else outer.default
                if beh.delay:
                    time.sleep(beh.delay)
                if beh.kind == "http_error":
                    body = json.dumps({"error": "boom"}).encode()
                    self.send_response(beh.status)
                elif beh.kind == "malformed":
                    body = b'{"response": "unterminated'
                    self.send_response(200)
                else:
                    body = json.dumps(outer._format(beh, payload)).encode()
                    self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)

    def _format(self, beh: Behavior, payload: Dict[str, Any]) -> Dict[str, Any]:
        if beh.kind == "empty_choices":
            return ({"model": payload.get("model"), "done": True}
                    if self.protocol == "ollama" else
                    {"object": "chat.completion", "choices": []})
        if self.protocol == "ollama":
            return {"model": payload.get("model", ""), "response": beh.text,
                    "done": True, "eval_count": 7}
        return {
            "object": "chat.completion",
            "model": payload.get("model", ""),
            "choices": [{"index": 0, "finish_reason": "stop",
                         "message": {"role": "assistant", "content": beh.text}}],
            "usage": {"prompt_tokens": 3, "completion_tokens": 7},
        }

    # ------------------------------------------------------------ control
    @property
    def url(self) -> str:
        host, port = self._server.server_address
        return f"http://{host}:{port}"

    def queue(self, *behaviors: Behavior) -> None:
        with self._lock:
            self.script.extend(behaviors)

    def __enter__(self) -> "FakeLLMServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._server.shutdown()
        self._server.server_close()
