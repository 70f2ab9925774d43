"""Full LLM-notes KB eval: one JSON line the driver can audit.

The reference's core value prop is LLM-authored atomic notes feeding
retrieval (/root/reference/llm/atomic_note_generator.py:139,
/root/reference/doc/document_processor.py:289). This harness measures
that mode end-to-end IN-IMAGE: the in-framework decoder LM serves note
generation over the Ollama wire format on the TPU (scripts/serve_llm.py)
while the pipeline runs on CPU in this process, builds every KB purely
from the model's generated notes (rule fallback OFF), answers the
94-kind synthetic cycle, and scores with the fixed evaluator
(run_evaluation.py). Emits ONE JSON line:

  {"metric": "llm_notes_em", "value": ..., "answer_f1": ...,
   "support_f1": ..., "rule_notes_em": <same sheet, rule notes>, ...}

Usage:
  python scripts/eval_llm_notes.py --model checkpoints/note_lm_tpu_large \
      --n 47 --seed 5
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time
import urllib.request
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_STATS_RE = re.compile(r"generated \d+ notes from \d+ chunks \((\{.*?\})\)")


def _wait_health(port: int, timeout: float = 900.0) -> None:
    t0 = time.time()
    url = f"http://127.0.0.1:{port}/api/generate"
    body = json.dumps({"model": "health", "prompt": "ping",
                       "stream": False}).encode()
    while time.time() - t0 < timeout:
        try:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=5) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(3.0)
    raise RuntimeError(f"serve_llm not healthy after {timeout}s")


def _write_cfg(path: Path, port: int, use_llm: bool,
               rule_fallback: bool) -> None:
    import yaml

    cfg = yaml.safe_load((REPO / "config.yaml").read_text())
    cfg.setdefault("system", {})["device"] = "cpu"
    cfg.setdefault("embedding", {}).update(backend="hash", dim=256)
    cfg.setdefault("vector_store", {})["index_type"] = "Flat"
    cfg.setdefault("llm", {})["provider"] = "ollama"
    cfg["llm"].setdefault("ollama", {}).update(
        base_url=f"http://127.0.0.1:{port}", model="note-lm", timeout=600)
    nl = cfg.setdefault("notes_llm", {})
    nl["use_llm"] = use_llm
    nl["enable_rule_fallback"] = rule_fallback
    path.write_text(yaml.safe_dump(cfg))


def _run_sheet(items: Path, cfg: Path, out: Path, llm: bool) -> dict:
    """main_musique + run_evaluation; returns metrics + note-gen stats."""
    cmd = [sys.executable, str(REPO / "main_musique.py"), str(items),
           str(out), "--config", str(cfg), "--workers", "1"]
    if not llm:
        cmd.append("--no-llm")
    env = dict(os.environ)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=out.parent)
    if p.returncode != 0:
        sys.stderr.write(p.stdout[-4000:] + p.stderr[-4000:])
        raise RuntimeError("main_musique failed")
    stats: Counter = Counter()
    for m in _STATS_RE.finditer(p.stderr + p.stdout):
        try:
            stats.update(json.loads(m.group(1).replace("'", '"')))
        except ValueError:
            pass
    ev = subprocess.run(
        [sys.executable, str(REPO / "run_evaluation.py"), str(out),
         str(items)], capture_output=True, text=True)
    metrics = json.loads(ev.stdout[ev.stdout.index("{"):])
    metrics["note_stats"] = dict(stats)
    return metrics


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="checkpoints/note_lm_tpu_large")
    ap.add_argument("--n", type=int, default=47,
                    help="items (94-kind cycle = 2 per kind at 188)")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--port", type=int, default=11435)
    ap.add_argument("--max-new", type=int, default=512)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--skip-rule-arm", action="store_true")
    ap.add_argument("--keep-server", action="store_true",
                    help="reuse an already-running serve_llm on --port")
    ap.add_argument("--workdir", default="")
    ap.add_argument("--report", default="docs/llm_notes_report.json")
    args = ap.parse_args()

    ws = Path(args.workdir) if args.workdir else Path(
        tempfile.mkdtemp(prefix="llm_notes_"))
    ws.mkdir(parents=True, exist_ok=True)
    items = ws / "items.jsonl"
    gen = subprocess.run(
        [sys.executable, str(REPO / "scripts/gen_synth_musique.py"),
         str(items), "--n", str(args.n), "--seed", str(args.seed)],
        capture_output=True, text=True)
    if gen.returncode != 0:
        sys.stderr.write(gen.stderr[-2000:])
        return 1

    server = None
    try:
        if not args.keep_server:
            log = open(ws / "server.log", "w")
            server = subprocess.Popen(
                [sys.executable, str(REPO / "scripts/serve_llm.py"),
                 "--model", args.model, "--port", str(args.port),
                 "--max-batch", str(args.max_batch),
                 "--max-new", str(args.max_new)],
                stdout=log, stderr=subprocess.STDOUT)
        _wait_health(args.port)

        cfg_llm = ws / "config_llm.yaml"
        _write_cfg(cfg_llm, args.port, use_llm=True, rule_fallback=False)
        t0 = time.time()
        llm_m = _run_sheet(items, cfg_llm, ws / "pred_llm.jsonl", llm=True)
        llm_s = time.time() - t0

        rule_m = {}
        if not args.skip_rule_arm:
            cfg_rule = ws / "config_rule.yaml"
            _write_cfg(cfg_rule, args.port, use_llm=False,
                       rule_fallback=True)
            rule_m = _run_sheet(items, cfg_rule, ws / "pred_rule.jsonl",
                                llm=False)

        report = {
            "model": args.model, "n_items": args.n, "seed": args.seed,
            "llm_notes": llm_m, "rule_notes": rule_m,
            "llm_wall_s": round(llm_s, 1), "workdir": str(ws),
        }
        rp = REPO / args.report
        rp.parent.mkdir(parents=True, exist_ok=True)
        rp.write_text(json.dumps(report, indent=1))
        print(json.dumps({
            "metric": "llm_notes_em", "value": llm_m.get("answer_em"),
            "answer_f1": llm_m.get("answer_f1"),
            "support_f1": llm_m.get("support_f1"),
            "rule_notes_em": rule_m.get("answer_em"),
            "n_items": args.n, "model": args.model,
            "note_stats": llm_m.get("note_stats"),
        }))
        return 0
    finally:
        if server is not None:
            server.terminate()
            try:
                server.wait(timeout=15)
            except subprocess.TimeoutExpired:
                server.kill()


if __name__ == "__main__":
    raise SystemExit(main())
