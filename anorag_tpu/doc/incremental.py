"""IncrementalProcessor: change detection, dependency-aware plans, cache repair.

Parity target: /root/reference/doc/incremental_processor.py — hash every
input file and classify new/modified/deleted/unchanged (:26-123); keep a
per-file result cache and a dependency graph (forward `depends_on` +
reverse `dependents`, :123-200); processing plans propagate changes to
dependent files and order work topologically so dependencies process
first (:223-304); integrity validation covers missing files, stale
hashes, broken dependency edges, and orphaned result entries, with a
repair pass that fixes exactly what validation found (:304-368).

Design differences from the reference: one state file (atomic view of
hashes + results + deps instead of three json files that can desync), and
the topological order is computed iteratively (no recursion limit on deep
dependency chains).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence

from anorag_tpu.utils.file_io import file_sha1, read_json, write_json
from anorag_tpu.utils.logging import get_logger

logger = get_logger("anorag.doc")


class IncrementalProcessor:
    def __init__(self, cache_dir: str | Path):
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)
        self.state_path = self.cache_dir / "file_hashes.json"
        state = read_json(self.state_path) if self.state_path.exists() else {}
        if state and "hashes" not in state:
            # round-2 format: a bare {path: hash} map
            state = {"hashes": state, "results": {}, "deps": {}}
        self._hashes: Dict[str, str] = dict(state.get("hashes", {}))
        self._results: Dict[str, Any] = dict(state.get("results", {}))
        # deps[path] = sorted list of paths it depends on (reverse edges
        # are derived, not stored — they cannot desync)
        self._deps: Dict[str, List[str]] = {
            k: list(v) for k, v in (state.get("deps", {}) or {}).items()
        }

    # ------------------------------------------------------------- state
    def _save(self) -> None:
        write_json(self.state_path, {
            "hashes": self._hashes,
            "results": self._results,
            "deps": self._deps,
        })

    # ----------------------------------------------------- change detection
    def check_files_for_changes(self, file_paths: Sequence[str | Path]) -> Dict[str, List[str]]:
        current = {str(p): file_sha1(p) for p in file_paths if Path(p).exists()}
        new = [p for p in current if p not in self._hashes]
        modified = [p for p, h in current.items()
                    if p in self._hashes and self._hashes[p] != h]
        unchanged = [p for p, h in current.items()
                     if p in self._hashes and self._hashes[p] == h]
        deleted = [p for p in self._hashes if p not in current]
        return {"new": new, "modified": modified, "unchanged": unchanged,
                "deleted": deleted, "_hashes": current}

    # ------------------------------------------------------- dependencies
    def add_dependency(self, file_path: str | Path,
                       depends_on: Sequence[str | Path]) -> None:
        """Declare that `file_path`'s processing consumes the outputs of
        `depends_on` — a change to any of them invalidates `file_path`."""
        self._deps[str(file_path)] = sorted({str(p) for p in depends_on})
        self._save()

    def dependents_of(self, paths: Sequence[str]) -> List[str]:
        """Transitive closure of files whose declared dependencies include
        any of `paths` (directly or through other dependents)."""
        changed = set(paths)
        out: set = set()
        frontier = set(paths)
        while frontier:
            nxt = {
                f for f, deps in self._deps.items()
                if f not in out and f not in changed and frontier & set(deps)
            }
            out |= nxt
            frontier = nxt
        return sorted(out)

    def optimize_processing_order(self, files: Sequence[str]) -> List[str]:
        """Topological order over the declared dependency edges restricted
        to `files` — dependencies first. Iterative Kahn's algorithm; cycles
        (malformed declarations) fall back to input order for their
        members rather than failing the build."""
        files_set = set(files)
        indeg = {f: 0 for f in files}
        edges: Dict[str, List[str]] = {f: [] for f in files}   # dep -> users
        for f in files:
            for dep in self._deps.get(f, []):
                if dep in files_set:
                    edges[dep].append(f)
                    indeg[f] += 1
        ready = [f for f in files if indeg[f] == 0]     # stable input order
        out: List[str] = []
        while ready:
            f = ready.pop(0)
            out.append(f)
            for user in edges[f]:
                indeg[user] -= 1
                if indeg[user] == 0:
                    ready.append(user)
        if len(out) < len(files):                        # cycle remainder
            out.extend(f for f in files if f not in set(out))
        return out

    # -------------------------------------------------------------- plans
    def get_processing_plan(self, file_paths: Sequence[str | Path],
                            force: bool = False) -> Dict[str, Any]:
        changes = self.check_files_for_changes(file_paths)
        if force:
            to_process = [str(p) for p in file_paths]
            dependents: List[str] = []
        else:
            direct = changes["new"] + changes["modified"]
            # deleted inputs also invalidate their dependents
            dependents = [
                p for p in self.dependents_of(direct + changes["deleted"])
                if p in changes["_hashes"] and p not in direct
            ]
            to_process = self.optimize_processing_order(direct + dependents)
        skip = [] if force else [p for p in changes["unchanged"]
                                 if p not in set(to_process)]
        return {
            "to_process": to_process,
            "dependents": dependents,
            "skip": skip,
            "deleted": changes["deleted"],
            "full_rebuild": force or bool(changes["deleted"]),
            "can_skip_processing": not to_process and not changes["deleted"],
            "_hashes": changes["_hashes"],
        }

    # -------------------------------------------------------- result cache
    def update_file_cache(self, file_path: str | Path, result: Any) -> None:
        p = str(file_path)
        if Path(p).exists():
            self._hashes[p] = file_sha1(p)
        self._results[p] = result
        self._save()

    def batch_update_cache(self, file_results: Dict[str, Any]) -> None:
        for p, r in file_results.items():
            if Path(p).exists():
                self._hashes[str(p)] = file_sha1(p)
            self._results[str(p)] = r
        self._save()

    def get_cached_result(self, file_path: str | Path) -> Optional[Any]:
        return self._results.get(str(file_path))

    def remove_from_cache(self, file_path: str | Path) -> None:
        p = str(file_path)
        self._hashes.pop(p, None)
        self._results.pop(p, None)
        self._deps.pop(p, None)
        for deps in self._deps.values():
            if p in deps:
                deps.remove(p)
        self._save()

    def commit(self, hashes: Dict[str, str]) -> None:
        self._hashes = dict(hashes)
        self._save()

    # ----------------------------------------------------------- integrity
    def validate_cache_integrity(
        self, expected_artifacts: Sequence[str | Path] = ()) -> Dict[str, Any]:
        """Four invariant checks over the cache (ref :304-338) plus the
        artifact existence/parse checks the round-2 version had."""
        missing_files = [p for p in self._hashes if not Path(p).exists()]
        hash_mismatches = [
            p for p, h in self._hashes.items()
            if Path(p).exists() and file_sha1(p) != h
        ]
        broken_dependencies = [
            {"file": f, "missing_dependency": dep}
            for f, deps in self._deps.items()
            for dep in deps if not Path(dep).exists()
        ]
        orphaned = [p for p in self._results if p not in self._hashes]

        missing_artifacts = [str(p) for p in expected_artifacts
                             if not Path(p).exists()]
        corrupt_artifacts = []
        for p in expected_artifacts:
            p = Path(p)
            if p.exists() and p.suffix == ".json":
                try:
                    json.loads(p.read_text(encoding="utf-8"))
                except Exception:
                    corrupt_artifacts.append(str(p))
        ok = not (missing_files or hash_mismatches or broken_dependencies
                  or orphaned or missing_artifacts or corrupt_artifacts)
        result = {
            "ok": ok,
            "missing_files": missing_files,
            "hash_mismatches": hash_mismatches,
            "broken_dependencies": broken_dependencies,
            "orphaned_cache_entries": orphaned,
            "missing": missing_artifacts,
            "corrupt": corrupt_artifacts,
        }
        if not ok:
            logger.warning("cache integrity: %s",
                           {k: v for k, v in result.items() if v and k != "ok"})
        return result

    def repair_cache(self, validation: Optional[Dict[str, Any]] = None) -> None:
        """Fix exactly what validation found (ref :340-368): drop entries
        for vanished files, refresh stale hashes, prune broken dependency
        edges, remove orphaned results."""
        v = validation or self.validate_cache_integrity()
        for p in v.get("missing_files", []):
            self.remove_from_cache(p)
        for p in v.get("hash_mismatches", []):
            if Path(p).exists():
                self._hashes[p] = file_sha1(p)
        for issue in v.get("broken_dependencies", []):
            deps = self._deps.get(issue["file"], [])
            if issue["missing_dependency"] in deps:
                deps.remove(issue["missing_dependency"])
        for p in v.get("orphaned_cache_entries", []):
            self._results.pop(p, None)
        self._save()
        logger.info("cache repair completed")

    def get_cache_statistics(self) -> Dict[str, Any]:
        size = self.state_path.stat().st_size if self.state_path.exists() else 0
        return {
            "total_cached_files": len(self._hashes),
            "processed_files": len(self._results),
            "dependency_count": len(self._deps),
            "cache_size_bytes": size,
        }

    def repair(self) -> None:
        """Drop the whole state so everything reprocesses."""
        self._hashes = {}
        self._results = {}
        self._deps = {}
        if self.state_path.exists():
            self.state_path.unlink()
