"""Database discovery + global repo registry.

Parity with src/db_discovery/mod.rs: find ``.codesearch.db`` in cwd →
direct children (skipping hidden dirs / node_modules / target) → up to 5
parent levels → the global ``~/.codesearch/repos.json`` registry. A valid
database has metadata.json + the vector matrix file + fts/ (adapted from
the reference's metadata.json + data.mdb + fts/, mod.rs:49).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from pathlib import Path

from ..utils.constants import (
    DB_DIR_NAME,
    FTS_DIR_NAME,
    METADATA_FILE_NAME,
    REPOS_CONFIG_FILE,
    VEC_MANIFEST_FILE,
    get_config_dir,
)

PARENT_SEARCH_LEVELS = 5
_SKIP_CHILD_DIRS = {"node_modules", "target", "dist", "build", "__pycache__"}


def is_valid_database(db_path: Path) -> bool:
    return (
        (db_path / METADATA_FILE_NAME).exists()
        and (db_path / VEC_MANIFEST_FILE).exists()
        and (db_path / FTS_DIR_NAME).exists()
    )


@dataclass
class DbIntegrity:
    valid: bool
    has_metadata: bool
    has_vectors: bool
    has_fts: bool


def check_integrity(db_path: Path) -> DbIntegrity:
    hm = (db_path / METADATA_FILE_NAME).exists()
    hv = (db_path / VEC_MANIFEST_FILE).exists()
    hf = (db_path / FTS_DIR_NAME).exists()
    return DbIntegrity(valid=hm and hv and hf, has_metadata=hm, has_vectors=hv, has_fts=hf)


def find_databases(start: Path | None = None) -> list[Path]:
    """All valid databases findable from ``start`` (mod.rs:97)."""
    start = (start or Path.cwd()).resolve()
    found: list[Path] = []
    seen: set[Path] = set()

    def consider(p: Path) -> None:
        if p in seen:
            return
        seen.add(p)
        if p.is_dir() and is_valid_database(p):
            found.append(p)

    consider(start / DB_DIR_NAME)
    try:
        for child in sorted(start.iterdir()):
            if not child.is_dir():
                continue
            if child.name.startswith(".") or child.name in _SKIP_CHILD_DIRS:
                continue
            consider(child / DB_DIR_NAME)
    except OSError:
        pass
    cur = start
    for _ in range(PARENT_SEARCH_LEVELS):
        parent = cur.parent
        if parent == cur:
            break
        consider(parent / DB_DIR_NAME)
        cur = parent
    for repo in registered_repos():
        consider(Path(repo) / DB_DIR_NAME)
    return found


def find_best_database(start: Path | None = None) -> Path | None:
    """Closest valid database: cwd, children, parents, registry (mod.rs:176)."""
    start = (start or Path.cwd()).resolve()
    direct = start / DB_DIR_NAME
    if is_valid_database(direct):
        return direct
    try:
        for child in sorted(start.iterdir()):
            if not child.is_dir():
                continue
            if child.name.startswith(".") or child.name in _SKIP_CHILD_DIRS:
                continue
            c = child / DB_DIR_NAME
            if is_valid_database(c):
                return c
    except OSError:
        pass
    cur = start
    for _ in range(PARENT_SEARCH_LEVELS):
        parent = cur.parent
        if parent == cur:
            break
        p = parent / DB_DIR_NAME
        if is_valid_database(p):
            return p
        cur = parent
    for repo in registered_repos():
        p = Path(repo) / DB_DIR_NAME
        if is_valid_database(p):
            return p
    return None


def resolve_database_with_message(start: Path | None = None) -> tuple[Path | None, str]:
    db = find_best_database(start)
    if db is not None:
        return db, f"using database: {db}"
    return None, (
        "no index found — run `codesearch index` to create one "
        f"(searched cwd, children, {PARENT_SEARCH_LEVELS} parent levels, registry)"
    )


# ---------------------------------------------------------------------------
# global registry (~/.codesearch/repos.json)
# ---------------------------------------------------------------------------

def _registry_path() -> Path:
    return get_config_dir() / REPOS_CONFIG_FILE


def registered_repos() -> list[str]:
    p = _registry_path()
    if not p.exists():
        return []
    try:
        return list(json.loads(p.read_text()).get("repos", []))
    except (json.JSONDecodeError, OSError):
        return []


def register_repo(repo_root: Path) -> None:
    repos = set(registered_repos())
    repos.add(str(Path(repo_root).resolve()))
    p = _registry_path()
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps({"repos": sorted(repos)}))
    os.replace(tmp, p)


def unregister_repo(repo_root: Path) -> None:
    repos = set(registered_repos())
    repos.discard(str(Path(repo_root).resolve()))
    p = _registry_path()
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps({"repos": sorted(repos)}))
    os.replace(tmp, p)
