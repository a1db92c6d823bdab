"""Branch-switch refresh integration tests against a real git repo
(reference pattern: tests/helpers TestRepo + refresh_index_with_stores)."""

from pathlib import Path

import pytest

from codesearch_tpu.embed import EmbeddingService
from codesearch_tpu.index import IndexOptions, index
from codesearch_tpu.index.manager import IndexManager, SharedStores
from codesearch_tpu.index.pipeline import read_metadata
from codesearch_tpu.search import SearchOptions, SearchSession
from codesearch_tpu.watch import GitHeadWatcher

from helpers import TestRepo


@pytest.fixture()
def repo(tmp_path):
    r = TestRepo(tmp_path / "repo")
    r.write("src/app.py", '''def main_feature():
    """The original main feature."""
    return "original"
''')
    r.write("src/util.py", '''def helper_function():
    return 42
''')
    r.commit_all("initial")
    return r


class TestBranchSwitch:
    def test_head_watcher_detects_switch(self, repo):
        w = GitHeadWatcher(repo.root)
        assert w.check() is None
        repo.create_branch("feature", {"src/new_code.py": "def feature_fn():\n    return 1\n"})
        change = w.check()
        assert change is not None and "feature" in change.new_head

    def test_branch_refresh_updates_index(self, repo):
        index(repo.root, IndexOptions(quiet=True))
        db = repo.root / ".codesearch.db"
        meta = read_metadata(db)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        mgr = IndexManager(repo.root, db, stores, service)

        # switch to a branch that adds one file and deletes another
        repo.create_branch("feature", {
            "src/new_code.py": "def brand_new_feature():\n    return 'new'\n",
            "src/util.py": None,
        })
        mgr.refresh_for_branch_change()
        assert mgr.status == "ready"

        with stores.lock:
            paths = stores.store.all_paths()
        assert any("new_code.py" in p for p in paths)
        assert not any("util.py" in p for p in paths)

        # switch back: the deleted file returns, the new one goes
        repo.checkout("main")
        mgr.refresh_for_branch_change()
        with stores.lock:
            paths = stores.store.all_paths()
        assert any("util.py" in p for p in paths)
        assert not any("new_code.py" in p for p in paths)
        if lock:
            lock.release()

    def test_search_after_switch(self, repo):
        index(repo.root, IndexOptions(quiet=True))
        repo.create_branch("feature", {
            "src/app.py": '''def main_feature():
    """The completely rewritten quantum feature."""
    return "quantum_overhaul"
'''})
        index(repo.root, IndexOptions(quiet=True))  # incremental refresh
        session = SearchSession(repo.root / ".codesearch.db")
        resp = session.search("quantum overhaul feature", SearchOptions(limit=3))
        assert resp.hits
        assert any("quantum" in h.content for h in resp.hits)
        # stale content must be gone
        assert not any('return "original"' in h.content for h in resp.hits)
