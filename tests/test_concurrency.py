"""Concurrency: readers (searches) interleaved with the single writer
(refresh/watcher batches) on shared stores — the MCP server's runtime model
(reference: Arc<RwLock> stores, manager.rs:128-136)."""

import threading
import time

import pytest

from codesearch_tpu.embed import EmbeddingService
from codesearch_tpu.index import IndexOptions, index
from codesearch_tpu.index.manager import IndexManager, SharedStores
from codesearch_tpu.index.pipeline import read_metadata
from codesearch_tpu.server.mcp import CodesearchService, make_placeholder_db
from codesearch_tpu.watch.watcher import EventKind, FileEvent


@pytest.fixture()
def live(tmp_repo):
    index(tmp_repo, IndexOptions(quiet=True))
    db = tmp_repo / ".codesearch.db"
    meta = read_metadata(db)
    service = EmbeddingService(meta["model"])
    stores, lock = SharedStores.new_or_readonly(db, service.dims)
    mgr = IndexManager(tmp_repo, db, stores, service)
    svc = CodesearchService(tmp_repo, db, stores, service, mgr)
    yield tmp_repo, svc, mgr
    if lock:
        lock.release()


class TestConcurrentSearchAndRefresh:
    def test_searches_during_writer_batches(self, live):
        repo, svc, mgr = live
        errors: list[Exception] = []
        stop = threading.Event()

        def searcher():
            i = 0
            while not stop.is_set():
                try:
                    out = svc.semantic_search({"query": "parse configuration", "limit": 5})
                    assert "results" in out
                    out2 = svc.find_references({"symbol": "parse_config"})
                    assert "references" in out2
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                    return
                i += 1

        threads = [threading.Thread(target=searcher) for _ in range(4)]
        for t in threads:
            t.start()
        try:
            # writer: 20 watcher batches mutating files while searches run
            for i in range(20):
                p = repo / "src" / f"gen_{i % 5}.py"
                p.write_text(f"def generated_fn_{i}():\n    return {i}\n")
                mgr.process_batch([FileEvent(EventKind.MODIFIED, p)])
                if i % 7 == 6:
                    (repo / "src" / f"gen_{i % 5}.py").unlink()
                    mgr.process_batch([FileEvent(EventKind.DELETED, p)])
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=30)
        assert not errors, errors[:1]
        # final state consistent: a fresh status reflects a sane store
        status = svc.index_status({})
        assert status["total_chunks"] > 0

    def test_background_manager_lifecycle(self, live):
        repo, svc, mgr = live
        mgr.start_background(initial_refresh=False)
        assert mgr.watcher_ready.wait(timeout=30)
        (repo / "src" / "live_added.py").write_text("def live_added():\n    return 1\n")
        deadline = time.time() + 30
        found = False
        while time.time() < deadline:
            out = svc.semantic_search({"query": "live_added", "limit": 5})
            if any("live_added.py" in r["path"] for r in out["results"]):
                found = True
                break
            time.sleep(0.5)
        with svc.stores.lock:
            paths = svc.stores.store.all_paths()
        mgr.stop()
        assert found, (
            f"watcher did not pick up the new file within 30s "
            f"(status={mgr.status!r} msg={mgr.status_message!r} paths={paths})"
        )


class TestPlaceholderStartup:
    def test_placeholder_is_valid_and_searchable(self, tmp_path):
        from codesearch_tpu.index.db_discovery import is_valid_database
        from codesearch_tpu.index.manager import SharedStores

        db = tmp_path / ".codesearch.db"
        service = EmbeddingService("code-hash-384", use_persistent_cache=False)
        make_placeholder_db(db, service)
        assert is_valid_database(db)
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        svc = CodesearchService(tmp_path, db, stores, service, None)
        out = svc.semantic_search({"query": "anything", "limit": 3})
        assert out["results"] == []
        status = svc.index_status({})
        assert status["indexed"] is False
        if lock:
            lock.release()
