"""IncrementalProcessor: file-hash change detection + processing plans.

Parity target: /root/reference/doc/incremental_processor.py — hash every
input file, classify new/modified/deleted/unchanged (:26-123), emit a
processing plan, and validate/repair cache integrity (:304).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Sequence

from anorag_tpu.utils.file_io import file_sha1, read_json, write_json
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.doc")


class IncrementalProcessor:
    def __init__(self, cache_dir: str | Path):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.state_path = self.cache_dir / "file_hashes.json"
        self._state: Dict[str, str] = (
            read_json(self.state_path) if self.state_path.exists() else {}
        )

    def check_files_for_changes(self, file_paths: Sequence[str | Path]) -> Dict[str, List[str]]:
        current = {str(p): file_sha1(p) for p in file_paths if Path(p).exists()}
        new = [p for p in current if p not in self._state]
        modified = [p for p, h in current.items()
                    if p in self._state and self._state[p] != h]
        unchanged = [p for p, h in current.items()
                     if p in self._state and self._state[p] == h]
        deleted = [p for p in self._state if p not in current]
        return {"new": new, "modified": modified, "unchanged": unchanged,
                "deleted": deleted, "_hashes": current}

    def get_processing_plan(self, file_paths: Sequence[str | Path],
                            force: bool = False) -> Dict[str, Any]:
        changes = self.check_files_for_changes(file_paths)
        to_process = (
            [str(p) for p in file_paths]
            if force else changes["new"] + changes["modified"]
        )
        return {
            "to_process": to_process,
            "skip": [] if force else changes["unchanged"],
            "deleted": changes["deleted"],
            "full_rebuild": force or bool(changes["deleted"]),
            "_hashes": changes["_hashes"],
        }

    def commit(self, hashes: Dict[str, str]) -> None:
        self._state = dict(hashes)
        write_json(self.state_path, self._state)

    def validate_cache_integrity(self, expected_artifacts: Sequence[str | Path]) -> Dict[str, Any]:
        missing = [str(p) for p in expected_artifacts if not Path(p).exists()]
        corrupt = []
        for p in expected_artifacts:
            p = Path(p)
            if p.exists() and p.suffix == ".json":
                try:
                    json.loads(p.read_text(encoding="utf-8"))
                except Exception:
                    corrupt.append(str(p))
        ok = not missing and not corrupt
        if not ok:
            logger.warning("cache integrity: missing=%s corrupt=%s", missing, corrupt)
        return {"ok": ok, "missing": missing, "corrupt": corrupt}

    def repair(self) -> None:
        """Drop the hash state so everything reprocesses."""
        self._state = {}
        if self.state_path.exists():
            self.state_path.unlink()
