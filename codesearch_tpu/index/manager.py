"""Index manager: shared stores + live refresh loop for servers.

Parity with src/index/manager.rs: SharedStores guarded by an RW-style lock,
a cross-process writer lock file (fcntl flock — readonly fallback when
another writer is live, manager.rs:46-208), a background loop that drains
the debounced file watcher (2s batch flush, modify/delete coalescing),
polls `.git/HEAD` (~100ms cadence) and performs branch-change refreshes with
a vector-store orphan sweep (manager.rs:933-1105), and per-file reindex of
watcher events (manager.rs:1173-1275).
"""

from __future__ import annotations

import contextlib
import threading
import time
from pathlib import Path

from ..chunker import (
    FSW_MAX_CHUNK_CHARS,
    FSW_MAX_CHUNK_LINES,
    FSW_OVERLAP_LINES,
    SemanticChunker,
)
from ..embed import EmbeddingService
from ..fileio.language import detect_language
from ..fts import FtsStore
from ..utils.constants import (
    FSW_POLL_INTERVAL_MS,
    FTS_DIR_NAME,
    WRITER_LOCK_FILE,
    is_shutdown_requested,
)
from ..utils.logger import get_logger
from ..vectordb import ChunkMetadata, VectorStore
from ..watch import EventKind, FileWatcher, GitHeadWatcher
from .file_meta import FileMetaStore, normalize_path
from .pipeline import IndexOptions, index, read_metadata

log = get_logger("manager")

import numpy as np


class WriterLock:
    """Cross-process single-writer lock via flock on <db>/.writer.lock."""

    def __init__(self, db_path: Path):
        self.path = Path(db_path) / WRITER_LOCK_FILE
        self._fh = None

    def acquire(self) -> bool:
        import fcntl

        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "w")
        try:
            fcntl.flock(self._fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
            self._fh.write(str(int(time.time())))
            self._fh.flush()
            return True
        except OSError:
            self._fh.close()
            self._fh = None
            return False

    def release(self) -> None:
        if self._fh is not None:
            import fcntl

            with contextlib.suppress(OSError):
                fcntl.flock(self._fh, fcntl.LOCK_UN)
            self._fh.close()
            self._fh = None


class SharedStores:
    """Store trio shared between searchers (readers) and the refresher
    (single writer) under one re-entrant lock."""

    def __init__(self, db_path: Path, dims: int, readonly: bool):
        self.db_path = Path(db_path)
        self.lock = threading.RLock()
        self.store = VectorStore(db_path, dims=dims, readonly=readonly)
        self.fts = FtsStore(self.db_path / FTS_DIR_NAME, readonly=readonly)
        self.readonly = readonly

    @classmethod
    def new_or_readonly(cls, db_path: Path, dims: int) -> tuple["SharedStores", WriterLock | None]:
        lock = WriterLock(db_path)
        if lock.acquire():
            return cls(db_path, dims, readonly=False), lock
        log.info("another writer holds %s — opening readonly", lock.path)
        return cls(db_path, dims, readonly=True), None


class IndexManager:
    """Owns the background freshness loop for a long-lived server."""

    def __init__(
        self,
        project_root: Path,
        db_path: Path,
        stores: SharedStores,
        service: EmbeddingService,
    ):
        self.project_root = Path(project_root)
        self.db_path = Path(db_path)
        self.stores = stores
        self.service = service
        self.status = "ready"
        self.status_message = ""
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()
        # set once the filesystem watcher is registered: writes BEFORE this
        # point are only caught by the initial refresh (the reference starts
        # the watcher before refreshing for exactly this boot-time gap,
        # manager.rs:618)
        self.watcher_ready = threading.Event()
        self._chunker = SemanticChunker(
            FSW_MAX_CHUNK_LINES, FSW_MAX_CHUNK_CHARS, FSW_OVERLAP_LINES
        )

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def start_background(self, initial_refresh: bool = True) -> None:
        if self.stores.readonly:
            return
        self._thread = threading.Thread(
            target=self._run, args=(initial_refresh,), daemon=True,
            name="codesearch-index-manager",
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def _run(self, initial_refresh: bool) -> None:
        watcher = FileWatcher(self.project_root)
        head = GitHeadWatcher(self.project_root)
        self.watcher_ready.set()
        try:
            if initial_refresh:
                self.status = "building"
                self.perform_incremental_refresh()
                self.status = "ready"
            while not self._stop.is_set() and not is_shutdown_requested():
                change = head.check()
                if change is not None:
                    log.info("branch change detected: %s", change.new_head.strip())
                    self.refresh_for_branch_change()
                batch = watcher.poll()
                if batch:
                    self.process_batch(batch)
                time.sleep(FSW_POLL_INTERVAL_MS / 1000.0)
        except Exception as e:  # background loop must not die silently
            log.exception("index manager loop failed: %s", e)
            self.status = "error"
            self.status_message = str(e)
        finally:
            watcher.close()

    # ------------------------------------------------------------------
    # refresh operations
    # ------------------------------------------------------------------

    def perform_incremental_refresh(self) -> None:
        """In-process incremental refresh against live stores
        (manager.rs:394-611)."""
        with self.stores.lock:
            index(
                self.project_root,
                IndexOptions(model=self.service.model_name, quiet=True),
                service=self.service,
                stores=(self.stores.store, self.stores.fts),
            )

    def refresh_for_branch_change(self) -> None:
        """Branch switch: incremental refresh + orphan sweep
        (manager.rs:933-1105)."""
        self.status = "building"
        try:
            self.perform_incremental_refresh()
            self.sweep_orphans()
            self.status = "ready"
        except Exception as e:
            self.status = "error"
            self.status_message = str(e)
            log.exception("branch refresh failed: %s", e)

    def sweep_orphans(self) -> int:
        """Remove store chunks whose ids are not in the file manifest
        (reconciling VectorStore vs disk, manager.rs:1033-1082)."""
        with self.stores.lock:
            fm = FileMetaStore.load_or_create(self.db_path, self.service.model_name)
            manifest_ids = {cid for e in fm.files.values() for cid in e.chunk_ids}
            orphans = [cid for cid in self.stores.store.all_ids()
                       if cid not in manifest_ids]
            if orphans:
                self.stores.store.delete_chunks(orphans)
                for cid in orphans:
                    self.stores.fts.delete_chunk(cid)
                self.stores.store.save()
                self.stores.fts.commit()
                log.info("swept %d orphan chunks", len(orphans))
            return len(orphans)

    def process_batch(self, batch) -> None:
        """Apply one debounced watcher batch (manager.rs:799-919)."""
        with self.stores.lock:
            fm = FileMetaStore.load_or_create(self.db_path, self.service.model_name)
            changed = False
            for ev in batch:
                try:
                    if ev.kind is EventKind.DELETED:
                        changed |= self._remove_path(ev.path, fm)
                    else:
                        changed |= self._index_single_file(ev.path, fm)
                except Exception as e:
                    log.warning("event %s failed: %s", ev, e)
            if changed:
                self.stores.store.save()
                with contextlib.suppress(Exception):
                    self.stores.fts.commit()
                fm.save()

    def _remove_path(self, path: Path, fm: FileMetaStore) -> bool:
        """Remove a file — or a directory prefix (manager.rs:1279-1352)."""
        key = normalize_path(path)
        removed_any = False
        victims = [p for p in list(fm.files) if p == key or p.startswith(key + "/")]
        for victim in victims:
            ids = fm.remove_file(victim)
            if ids:
                self.stores.store.delete_chunks(ids)
                for cid in ids:
                    self.stores.fts.delete_chunk(cid)
            removed_any = True
        return removed_any

    def _index_single_file(self, path: Path, fm: FileMetaStore) -> bool:
        """Re-chunk + re-embed one file (manager.rs:1173-1275)."""
        if not path.exists():
            return self._remove_path(path, fm)
        check = fm.check_file(path)
        if not check.changed:
            return False
        try:
            content = path.read_text(encoding="utf-8", errors="replace")
        except OSError:
            return False
        lang = detect_language(path)
        rel = path.relative_to(self.project_root) if path.is_relative_to(self.project_root) else path
        chunks = self._chunker.chunk_semantic(lang, rel, content)
        old_ids = fm.chunk_ids_for(path)
        if old_ids:
            self.stores.store.delete_chunks(old_ids)
            for cid in old_ids:
                self.stores.fts.delete_chunk(cid)
        if chunks:
            embedded = self.service.embed_chunks(chunks)
            embs = np.stack([e.embedding for e in embedded])
            metas = [
                ChunkMetadata(
                    path=e.chunk.path,
                    content=e.chunk.content,
                    start_line=e.chunk.start_line,
                    end_line=e.chunk.end_line,
                    kind=e.chunk.kind.value,
                    context=e.chunk.context,
                    signature=e.chunk.signature,
                    docstring=e.chunk.docstring,
                    hash=e.chunk.hash,
                    language=lang.display_name,
                )
                for e in embedded
            ]
            ids = self.stores.store.insert_chunks_with_ids(embs, metas)
            self.stores.fts.add_chunks([
                (cid, m.content, m.path, m.signature, m.kind)
                for cid, m in zip(ids, metas)
            ])
            fm.update_file(path, ids, check.sha256)
        else:
            fm.update_file(path, [], check.sha256)
        return True
