"""Doctor: health checks + --fix (parity with src/cli/doctor.rs's 9 checks,
adapted to the TPU store: the LMDB-bloat check becomes a tombstone/compaction
check, the arroy-tree check becomes a matrix/manifest consistency check)."""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from ..fts import FtsStore
from ..index.db_discovery import check_integrity, find_best_database
from ..index.file_meta import FileMetaStore
from ..index.pipeline import find_git_root, read_metadata
from ..models import parse_model
from ..utils.constants import FTS_DIR_NAME, get_config_dir
from ..utils.output import result_print
from ..vectordb import VectorStore


@dataclass
class CheckResult:
    name: str
    ok: bool
    detail: str
    fixable: bool = False


def run_checks(path: Path) -> list[CheckResult]:
    checks: list[CheckResult] = []

    # 1. find database
    db = find_best_database(path)
    if db is None:
        checks.append(CheckResult("database", False, "no database found — run `codesearch index`"))
        return checks
    checks.append(CheckResult("database", True, str(db)))

    # 2. structure
    integ = check_integrity(db)
    checks.append(
        CheckResult(
            "structure",
            integ.valid,
            f"metadata={integ.has_metadata} vectors={integ.has_vectors} fts={integ.has_fts}",
            fixable=not integ.valid,
        )
    )

    # 3. model consistency
    meta = read_metadata(db)
    model = meta.get("model")
    spec = parse_model(model) if model else None
    ok = spec is not None and spec.dims == meta.get("dimensions")
    checks.append(
        CheckResult(
            "model",
            ok,
            f"{model} ({meta.get('dimensions')}d)" if ok else f"unknown/mismatched model {model!r}",
        )
    )

    # 4. git-root placement
    git_root = find_git_root(path.resolve())
    placed_ok = git_root is None or db.parent == git_root
    checks.append(
        CheckResult(
            "placement",
            placed_ok,
            f"db at {db.parent}, git root {git_root}" if git_root else "no git repo",
        )
    )

    # 5+6. file/chunk integrity: manifest ↔ store agreement
    dims = int(meta.get("dimensions", 384))
    fm = FileMetaStore.load_or_create(db)
    try:
        store = VectorStore(db, dims=dims, readonly=True)
        manifest_ids = {cid for e in fm.files.values() for cid in e.chunk_ids}
        store_ids = set(store.all_ids())
        ghosts = manifest_ids - store_ids
        orphans = store_ids - manifest_ids
        checks.append(
            CheckResult(
                "file_integrity",
                not ghosts,
                f"{len(fm.files)} files tracked; {len(ghosts)} ghost chunk refs",
                fixable=bool(ghosts),
            )
        )
        checks.append(
            CheckResult(
                "chunk_integrity",
                not orphans,
                f"{len(store_ids)} chunks; {len(orphans)} orphans (not in manifest)",
                fixable=bool(orphans),
            )
        )
        # 8. bloat → tombstones
        st = store.stats()
        bloat_ok = st.capacity == 0 or st.tombstones / max(st.capacity, 1) < 0.25
        checks.append(
            CheckResult(
                "bloat",
                bloat_ok,
                f"{st.tombstones}/{st.capacity} tombstoned rows",
                fixable=not bloat_ok,
            )
        )
    except Exception as e:
        checks.append(CheckResult("vector_store", False, f"failed to open: {e}", fixable=True))

    # 7. FTS health (segment count sanity: the merge policy keeps ≤ 12+1)
    try:
        fts = FtsStore(db / FTS_DIR_NAME, readonly=True)
        st = fts.stats()
        seg_ok = st["segments"] <= 16
        checks.append(CheckResult(
            "fts", seg_ok,
            f"{len(fts)} docs, {st['segments']} segments"
            + ("" if seg_ok else " (merge policy not converging)"),
            fixable=not seg_ok,
        ))
    except Exception as e:
        checks.append(CheckResult("fts", False, f"failed to open: {e}", fixable=True))

    # 9. embedding cache
    cache_root = get_config_dir() / "embedding_cache"
    if cache_root.exists():
        size = sum(f.stat().st_size for f in cache_root.rglob("*") if f.is_file())
        checks.append(CheckResult("embedding_cache", True, f"{size / 1e6:.1f} MB"))
    else:
        checks.append(CheckResult("embedding_cache", True, "empty"))
    return checks


def run_doctor(path: Path, fix: bool = False, json_out: bool = False) -> int:
    checks = run_checks(path)
    failed_fixable = [c for c in checks if not c.ok and c.fixable]
    if fix and failed_fixable:
        # the reference's --fix runs an incremental refresh (doctor.rs:489+)
        from ..index.pipeline import index_quiet

        index_quiet(path)
        checks = run_checks(path)
    if json_out:
        result_print(
            json.dumps(
                [{"name": c.name, "ok": c.ok, "detail": c.detail} for c in checks],
                indent=2,
            )
        )
    else:
        for c in checks:
            mark = "✓" if c.ok else "✗"
            result_print(f"{mark} {c.name}: {c.detail}")
    return 0 if all(c.ok for c in checks) else 1
