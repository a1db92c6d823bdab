"""Index pipeline + search pipeline + discovery + file-meta + watcher tests."""

import os
import time
from pathlib import Path

import numpy as np
import pytest

from codesearch_tpu.index import (
    FileMetaStore,
    IndexOptions,
    find_best_database,
    find_git_root,
    get_db_path_smart,
    index,
    read_metadata,
)
from codesearch_tpu.index.db_discovery import is_valid_database, register_repo
from codesearch_tpu.search import (
    SearchOptions,
    SearchSession,
    adapt_rrf_k,
    detect_identifiers,
    detect_structural_intent,
    expand_query,
    search,
)
from codesearch_tpu.chunker import ChunkKind
from codesearch_tpu.watch import EventKind, FileWatcher, GitHeadWatcher
from codesearch_tpu.watch.watcher import is_watchable


class TestQueryAnalysis:
    def test_detect_identifiers(self):
        assert detect_identifiers("find UserService class") == ["UserService"]
        assert detect_identifiers("handle_file_modified") == ["handle_file_modified"]
        assert detect_identifiers("getUserName helper") == ["getUserName"]
        assert detect_identifiers("Find the parser") == []  # stopword Pascal

    def test_structural_intent_needs_identifier(self):
        assert detect_structural_intent("enum") is None
        assert detect_structural_intent("all enums") is None
        assert detect_structural_intent("enum ChunkKind") is ChunkKind.ENUM
        assert detect_structural_intent("class UserService") is ChunkKind.CLASS
        assert detect_structural_intent("fn parse_config") is ChunkKind.FUNCTION

    def test_expand_query_function(self):
        v = expand_query("handle_file_modified")
        assert v[0] == "handle_file_modified"
        assert "fn handle_file_modified" in v
        assert len(v) <= 9

    def test_expand_query_type(self):
        v = expand_query("UserService")
        assert "struct UserService" in v
        assert "impl UserService" in v

    def test_expand_query_short_or_long(self):
        assert expand_query("ab") == ["ab"]
        long_q = "a" * 60
        assert expand_query(long_q) == [long_q]

    def test_expand_abbreviations(self):
        v = expand_query("auth flow")
        assert "authentication flow" in v

    def test_adapt_rrf_k(self):
        assert adapt_rrf_k("handle_file_modified") == (12.0, 28.0)
        assert adapt_rrf_k("class UserService") == (12.0, 28.0)  # identifier wins
        assert adapt_rrf_k("how are files walked") == (20.0, 20.0)

    def test_strip_question(self):
        from codesearch_tpu.search.analysis import strip_question

        assert strip_question("how do we detect binary files") == \
            "detect binary files"
        assert strip_question("where is the main entry point?") == \
            "main entry point"
        assert strip_question("how to parse config") == "parse config"
        # non-questions pass through untouched
        assert strip_question("detect binary files") is None
        assert strip_question("parse_config") is None
        # a degenerate all-filler question has no core
        assert strip_question("how do we") is None

    def test_expand_query_appends_question_core(self):
        v = expand_query("how do we detect binary files")
        assert v[0] == "how do we detect binary files"
        assert "detect binary files" in v

    def test_query_term_keys_drop_scaffolding(self):
        from codesearch_tpu.fts.store import query_term_keys, term_keys
        import numpy as np

        core = np.unique(term_keys("detect binary files"))
        got = query_term_keys("how do we detect binary files")
        np.testing.assert_array_equal(got, core)
        # non-questions keep every term
        np.testing.assert_array_equal(
            query_term_keys("detect binary files"), core
        )


class TestFileMeta:
    def test_check_and_update(self, tmp_path):
        f = tmp_path / "a.py"
        f.write_text("x = 1\n")
        fm = FileMetaStore.load_or_create(tmp_path / "db", "m")
        chk = fm.check_file(f)
        assert chk.changed and chk.reason == "new"
        fm.update_file(f, [1, 2])
        chk2 = fm.check_file(f)
        assert not chk2.changed
        # content change
        time.sleep(0.01)
        f.write_text("x = 2\n")
        chk3 = fm.check_file(f)
        assert chk3.changed and chk3.reason == "hash"

    def test_touch_without_change(self, tmp_path):
        f = tmp_path / "a.py"
        f.write_text("x = 1\n")
        fm = FileMetaStore.load_or_create(tmp_path / "db", "m")
        fm.update_file(f, [1])
        os.utime(f, (time.time() + 5, time.time() + 5))
        chk = fm.check_file(f)
        assert not chk.changed  # hash slow-path catches identity

    def test_model_change_invalidates(self, tmp_path):
        f = tmp_path / "a.py"
        f.write_text("x = 1\n")
        fm = FileMetaStore.load_or_create(tmp_path / "db", "model-a")
        fm.update_file(f, [1])
        fm.save()
        fm2 = FileMetaStore.load_or_create(tmp_path / "db", "model-b")
        assert fm2.files == {}

    def test_find_deleted(self, tmp_path):
        f = tmp_path / "a.py"
        f.write_text("x\n")
        fm = FileMetaStore.load_or_create(tmp_path / "db", "m")
        fm.update_file(f, [1])
        assert fm.find_deleted_files(set()) == [str(f).replace("\\", "/")]
        assert fm.find_deleted_files({str(f)}) == []


class TestDiscovery:
    def test_git_root(self, tmp_path):
        (tmp_path / ".git").mkdir()
        sub = tmp_path / "a" / "b"
        sub.mkdir(parents=True)
        assert find_git_root(sub) == tmp_path

    def test_git_worktree_file(self, tmp_path):
        (tmp_path / ".git").write_text("gitdir: /elsewhere/.git/worktrees/x\n")
        assert find_git_root(tmp_path) == tmp_path

    def test_global_db_placement_and_lookup(self, tmp_path, monkeypatch):
        import os

        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path / "home"))
        repo = tmp_path / "project"
        (repo / "src").mkdir(parents=True)
        (repo / "src" / "a.py").write_text("def alpha():\n    return 1\n")
        stats = index(repo, IndexOptions(quiet=True, global_db=True))
        # db lives under the config dir, not the project
        assert str(tmp_path / "home") in str(stats.db_path)
        assert not (repo / ".codesearch.db").exists()
        # discovery from inside the project finds the global db
        assert find_best_database(repo / "src") == stats.db_path
        resp = search("alpha", repo, SearchOptions(limit=3))
        assert resp.hits

    def test_db_path_smart_uses_git_root(self, tmp_path):
        (tmp_path / ".git").mkdir()
        sub = tmp_path / "src"
        sub.mkdir()
        db, root = get_db_path_smart(sub)
        assert root == tmp_path
        assert db == tmp_path / ".codesearch.db"


@pytest.fixture()
def indexed_repo(tmp_repo):
    stats = index(tmp_repo, IndexOptions(model="code-hash-384", quiet=True))
    return tmp_repo, stats


class TestIndexPipeline:
    def test_full_index(self, indexed_repo):
        repo, stats = indexed_repo
        assert stats.files_indexed >= 3
        assert stats.chunks_added > 0
        db = repo / ".codesearch.db"
        assert is_valid_database(db)
        meta = read_metadata(db)
        assert meta["model"] == "code-hash-384"
        assert meta["dimensions"] == 384

    def test_incremental_noop(self, indexed_repo):
        repo, _ = indexed_repo
        stats2 = index(repo, IndexOptions(quiet=True))
        assert stats2.files_indexed == 0
        assert stats2.files_unchanged >= 3

    def test_incremental_change(self, indexed_repo):
        repo, _ = indexed_repo
        time.sleep(0.01)
        (repo / "src" / "main.py").write_text("def brand_new_fn():\n    return 42\n")
        stats2 = index(repo, IndexOptions(quiet=True))
        assert stats2.files_indexed == 1
        assert stats2.chunks_deleted > 0

    def test_file_emptied_to_zero_chunks(self, indexed_repo):
        """A changed file whose new content yields no chunks must still have
        its old chunks removed."""
        import time as _t

        repo, _ = indexed_repo
        _t.sleep(0.01)
        (repo / "src" / "lib.rs").write_text("\n\n\n")
        stats = index(repo, IndexOptions(quiet=True))
        assert stats.files_indexed == 1
        session = SearchSession(repo / ".codesearch.db")
        assert all(
            "lib.rs" not in h.path
            for h in session.search("content hash walker", SearchOptions(limit=10)).hits
        )

    def test_dedup_drops_repeated_chunks(self, tmp_path):
        """--dedup: identical chunk content across files is embedded once
        (license headers / vendored code; chunker/dedup.py, wired behind
        IndexOptions.dedup — the reference ships the component unwired,
        dedup.rs:17-108)."""
        root = tmp_path / "repo"
        (root / "src").mkdir(parents=True)
        header = ("def licensed_helper():\n"
                  '    """Copyright (c) Example Corp. All rights reserved.\n'
                  "    Redistribution permitted under the MIT license.\"\"\"\n"
                  "    return None\n\n")
        (root / "src" / "a.py").write_text(header + "def alpha():\n    return 1\n")
        (root / "src" / "b.py").write_text(header + "def beta():\n    return 2\n")
        plain = index(root, IndexOptions(quiet=True,
                                         store_path=tmp_path / "db1"))
        deduped = index(root, IndexOptions(quiet=True, dedup=True,
                                           store_path=tmp_path / "db2"))
        assert deduped.chunks_deduped >= 1
        assert deduped.chunks_added == plain.chunks_added - deduped.chunks_deduped
        # unique content still searchable
        session = SearchSession(tmp_path / "db2")
        resp = session.search("beta", SearchOptions(limit=5))
        assert any("b.py" in h.path for h in resp.hits)

    def test_incremental_delete(self, indexed_repo):
        repo, _ = indexed_repo
        (repo / "src" / "lib.rs").unlink()
        stats2 = index(repo, IndexOptions(quiet=True))
        assert stats2.files_deleted == 1
        session = SearchSession(repo / ".codesearch.db")
        resp = session.search("content hash walker", SearchOptions(limit=10))
        assert all("lib.rs" not in h.path for h in resp.hits)


class TestSearchPipeline:
    def test_hybrid_search_finds_function(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("parse_config", repo, SearchOptions(limit=5))
        assert resp.hits
        top = resp.hits[0]
        assert "main.py" in top.path
        assert "parse_config" in (top.signature or top.content)

    def test_semantic_query(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("compute a content hash", repo, SearchOptions(limit=5))
        assert any("lib.rs" in h.path for h in resp.hits[:3])

    def test_path_filter(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("hash", repo, SearchOptions(limit=10, path_filter="lib.rs"))
        assert resp.hits
        assert all("lib.rs" in h.path for h in resp.hits)

    def test_vector_only_mode(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("configuration parsing", repo, SearchOptions(limit=5, mode="vector"))
        assert resp.mode == "vector"
        assert resp.hits

    def test_no_db_raises(self, tmp_path):
        from codesearch_tpu.utils.errors import SearchError

        with pytest.raises(SearchError):
            search("anything", tmp_path, SearchOptions(create_index=False))

    def test_rerank_path(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("parse the configuration file", repo,
                      SearchOptions(limit=5, rerank=True))
        assert resp.hits
        assert "rerank" in resp.timings_ms

    def test_response_cache_hit_and_invalidation(self, indexed_repo):
        repo, _ = indexed_repo
        session = SearchSession(repo / ".codesearch.db")
        opts = SearchOptions(limit=5)
        first = session.search("parse_config", opts)
        second = session.search("parse_config", opts)
        assert session.resp_cache_hits == 1
        assert second.timings_ms.get("cached") is True
        assert [(h.chunk_id, h.score) for h in second.hits] == [
            (h.chunk_id, h.score) for h in first.hits
        ]
        # cached hits are copies — caller mutation must not poison the cache
        second.hits[0].score = -1.0
        third = session.search("parse_config", opts)
        assert third.hits[0].score == first.hits[0].score
        # any store mutation invalidates (key embeds mutation counters)
        from codesearch_tpu.vectordb import ChunkMetadata

        session.store.readonly = False
        session.store.insert_chunks_with_ids(
            np.eye(1, session.store.dims, dtype=np.float32),
            [ChunkMetadata(path="x.py", content="def zz(): pass",
                           start_line=0, end_line=1, kind="Function")],
        )
        session.search("parse_config", opts)
        assert session.resp_cache_misses >= 2

    def test_per_file_cap(self, indexed_repo):
        repo, _ = indexed_repo
        resp = search("config", repo, SearchOptions(limit=10, per_file=1))
        paths = [h.path for h in resp.hits]
        assert len(paths) == len(set(paths))   # at most one hit per file

    def test_rrf_k_override_changes_fusion(self, indexed_repo):
        repo, _ = indexed_repo
        a = search("parse_config", repo, SearchOptions(limit=5))
        b = search("parse_config", repo, SearchOptions(limit=5, rrf_k=60.0))
        assert b.hits  # same corpus, different fusion constant still works
        assert a.hits[0].score != b.hits[0].score

    def test_index_dry_run_writes_nothing(self, tmp_path):
        from codesearch_tpu.index import IndexOptions, index

        (tmp_path / "a.py").write_text("def f(x):\n    return x\n")
        stats = index(tmp_path, IndexOptions(quiet=True, dry_run=True))
        assert stats.files_indexed == 1
        assert not (tmp_path / ".codesearch.db").exists()
        # a real run afterwards indexes normally
        stats2 = index(tmp_path, IndexOptions(quiet=True))
        assert stats2.chunks_added > 0

    def test_different_options_not_conflated(self, indexed_repo):
        repo, _ = indexed_repo
        session = SearchSession(repo / ".codesearch.db")
        a = session.search("parse_config", SearchOptions(limit=5))
        b = session.search("parse_config", SearchOptions(limit=2))
        assert session.resp_cache_hits == 0
        assert len(b.hits) <= 2 and len(a.hits) <= 5


class TestWatcher:
    def test_polling_watcher_detects_changes(self, tmp_path):
        (tmp_path / "a.py").write_text("x = 1\n")
        w = FileWatcher(tmp_path, debounce_ms=0, backend="polling")
        assert w.poll() == []
        time.sleep(0.01)
        (tmp_path / "b.py").write_text("y = 2\n")
        (tmp_path / "a.py").unlink()
        events = {(e.kind, e.path.name) for e in w.flush()}
        assert (EventKind.MODIFIED, "b.py") in events
        assert (EventKind.DELETED, "a.py") in events
        w.close()

    def test_inotify_watcher(self, tmp_path):
        try:
            w = FileWatcher(tmp_path, debounce_ms=0, backend="inotify")
        except Exception:
            pytest.skip("inotify unavailable")
        (tmp_path / "new.py").write_text("z = 3\n")
        time.sleep(0.1)
        events = {(e.kind, e.path.name) for e in w.flush()}
        assert (EventKind.MODIFIED, "new.py") in events
        w.close()

    def test_is_watchable(self, tmp_path):
        assert is_watchable(Path("src/main.py"))
        assert not is_watchable(Path("node_modules/x.js"))
        assert not is_watchable(Path(".git/config"))
        assert not is_watchable(Path("src/app.min.js"))
        assert not is_watchable(Path("img.png"))

    def test_git_head_watcher(self, tmp_path):
        git = tmp_path / ".git"
        git.mkdir()
        (git / "HEAD").write_text("ref: refs/heads/main\n")
        w = GitHeadWatcher(tmp_path)
        assert w.check() is None
        (git / "HEAD").write_text("ref: refs/heads/feature\n")
        change = w.check()
        assert change is not None
        assert "main" in change.old_head and "feature" in change.new_head
        assert w.check() is None

    def test_git_head_worktree(self, tmp_path):
        main = tmp_path / "main" / ".git" / "worktrees" / "wt"
        main.mkdir(parents=True)
        (main / "HEAD").write_text("ref: refs/heads/wt\n")
        wt = tmp_path / "wt"
        wt.mkdir()
        (wt / ".git").write_text(f"gitdir: {main}\n")
        w = GitHeadWatcher(wt)
        assert w.head_path == main / "HEAD"


class _PlainEmbedBackend:
    """Test shim exposing ONLY embed(): hides the hash table and
    featurize_queries so SearchSession takes the genuinely-unfused
    composition (embed_queries_batch → search_batch → fts.search as
    separate dispatches)."""

    def __init__(self, inner):
        self._inner = inner
        self.spec = inner.spec

    def embed(self, texts):
        return self._inner.embed(texts)


class TestFusedHybridDispatch:
    """The fused read plane (embed + vector top-k + BM25 in one dispatch,
    single-device AND its sharded mesh twin) must match the genuinely
    unfused composition of separate embed/vector/FTS calls."""

    def _index(self, tmp_path):
        from codesearch_tpu.index.pipeline import IndexOptions, index

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file into key/value pairs."""\n'
            "    return dict(l.split('=') for l in open(path))\n\n"
            "def draw_triangle(canvas):\n"
            '    """Render a triangle."""\n'
            "    canvas.poly(3)\n"
        )
        return index(root, IndexOptions(quiet=True))

    @staticmethod
    def _run(db_path, unfuse: bool = False):
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        sess = SearchSession(db_path, readonly=True)
        if unfuse:
            sess.service.backend = _PlainEmbedBackend(sess.service.backend)
        resp = sess.search("parse configuration file", SearchOptions(limit=5))
        return [(h.chunk_id, round(h.score, 6)) for h in resp.hits], resp.mode

    def test_fused_matches_sharded_fused(self, tmp_path, monkeypatch):
        """The sharded fused dispatch (8-device mesh) and the single-device
        fused dispatch must agree bit-for-bit at fusion depth."""
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._index(tmp_path)
        sharded, mode_a = self._run(stats.db_path)   # 8-device mesh twin
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            fused, mode_b = self._run(stats.db_path)  # single fused dispatch
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()
        assert fused == sharded
        assert mode_a == mode_b

    def test_fused_matches_unfused_composition(self, tmp_path, monkeypatch):
        """The single-device fused dispatch must equal the truly unfused
        composition: separate embed_queries_batch + search_batch +
        fts.search calls (VERDICT r2 item 9 — the old test's 'unfused' leg
        was actually the sharded fused dispatch)."""
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._index(tmp_path)
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            fused, mode_a = self._run(stats.db_path)
            unfused, mode_b = self._run(stats.db_path, unfuse=True)
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()
        assert fused == unfused
        assert mode_a == mode_b


class TestBertFusedDispatch:
    """Round-3: the fused single-dispatch read plane is model-agnostic —
    BERT-family backends (JAX encoder) get the same one-RTT hybrid as the
    hash model, on one device and on the mesh."""

    def _index(self, tmp_path):
        from codesearch_tpu.index.pipeline import IndexOptions, index

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file into key/value pairs."""\n'
            "    return dict(l.split('=') for l in open(path))\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget."""\n'
            "    canvas.blit()\n"
        )
        return index(root, IndexOptions(quiet=True, model="minilm-l6"))

    @staticmethod
    def _run(db_path, unfuse: bool = False, force_device_bm25: bool = False):
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        sess = SearchSession(db_path, readonly=True)
        if force_device_bm25:
            sess.fts.device_min_docs = 1   # exercise the fused BM25 leg
        if unfuse:
            sess.service.backend = _PlainEmbedBackend(sess.service.backend)
        resp = sess.search("parse configuration file", SearchOptions(limit=5))
        return [(h.chunk_id, round(h.score, 6)) for h in resp.hits], resp.mode

    def test_bert_fused_matches_unfused(self, tmp_path, monkeypatch):
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._index(tmp_path)
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            fused, _ = self._run(stats.db_path, force_device_bm25=True)
            unfused, _ = self._run(stats.db_path, unfuse=True)
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()
        assert fused
        assert [c for c, _ in fused] == [c for c, _ in unfused]

    def test_bert_fused_matches_sharded(self, tmp_path, monkeypatch):
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._index(tmp_path)
        sharded, _ = self._run(stats.db_path, force_device_bm25=True)
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            fused, _ = self._run(stats.db_path, force_device_bm25=True)
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()
        assert fused == sharded


class TestSearchParity:
    def test_search_auto_creates_index(self, tmp_repo):
        """Parity: `search` builds a missing index by default
        (search/mod.rs:413-435)."""
        from codesearch_tpu.search.pipeline import SearchOptions, search
        from codesearch_tpu.utils.constants import DB_DIR_NAME

        assert not (tmp_repo / DB_DIR_NAME).exists()
        resp = search("parse the configuration file", tmp_repo, SearchOptions(limit=3))
        assert resp.hits
        assert (tmp_repo / DB_DIR_NAME).exists()

    def test_no_create_index_errors(self, tmp_repo):
        import pytest

        from codesearch_tpu.search.pipeline import SearchOptions, search
        from codesearch_tpu.utils.errors import SearchError

        with pytest.raises(SearchError):
            search("anything", tmp_repo, SearchOptions(create_index=False))

    def test_path_filter_applies_post_rerank(self, tmp_repo):
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        stats = index(tmp_repo, IndexOptions(quiet=True))
        sess = SearchSession(stats.db_path, readonly=True)
        resp = sess.search(
            "parse the configuration",
            SearchOptions(limit=10, rerank=True, path_filter="main.py"),
        )
        assert all("main.py" in h.path for h in resp.hits)


class TestPathNormalizationMatrix:
    """Windows/UNC-style path normalization matrix (the reference tests this
    exhaustively, cache/file_meta.rs:313-560)."""

    def test_normalize_variants(self):
        from codesearch_tpu.index.file_meta import normalize_path

        cases = [
            ("src/sub/file.py", "src/sub/file.py"),
            ("src\\sub\\file.py", "src/sub/file.py"),
            ("\\\\?\\C:\\repo\\a.rs", "C:/repo/a.rs"),
            ("C:\\repo\\a.rs", "C:/repo/a.rs"),
            ("./src/./a.py", "src/a.py"),
            ("src//double//slash.py", "src/double/slash.py"),
        ]
        for raw, want in cases:
            assert normalize_path(raw) == want, raw

    def test_roundtrip_stability(self):
        from codesearch_tpu.index.file_meta import normalize_path

        p = "src\\nested\\deep\\mod.rs"
        once = normalize_path(p)
        assert normalize_path(once) == once


class TestSearchMany:
    """Round-3 batched serving: search_many must equal per-query search()
    exactly (same fusion/boost/filter semantics) while dispatching all
    device work before any readback."""

    def test_matches_sequential(self, tmp_path, monkeypatch):
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.parallel import mesh as mesh_mod
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file into key/value pairs."""\n'
            "    return dict(l.split('=') for l in open(path))\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget to the canvas."""\n'
            "    canvas.blit()\n\n"
            "def flush_buffer(buf):\n"
            '    """Write pending bytes out."""\n'
            "    buf.sync()\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            queries = [
                "parse configuration file",
                "draw the widget",
                "flush_buffer pending bytes",   # identifier → exact overlap
                '"configuration file" -widget',  # operators ride the wave
            ]
            s1 = SearchSession(stats.db_path, readonly=True)
            s1.fts.device_min_docs = 1
            batched = s1.search_many(queries, SearchOptions(limit=5))
            s2 = SearchSession(stats.db_path, readonly=True)
            s2.fts.device_min_docs = 1
            sequential = [s2.search(q, SearchOptions(limit=5)) for q in queries]
            for b, s in zip(batched, sequential):
                assert [(h.chunk_id, round(h.score, 6)) for h in b.hits] == \
                       [(h.chunk_id, round(h.score, 6)) for h in s.hits]
                assert b.mode == s.mode
            assert batched[3].hits and all(
                "widget" not in h.content for h in batched[3].hits
            )
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()

    def test_matches_sequential_sharded(self, tmp_path):
        """On the 8-device corpus mesh the wave rides the sharded batched
        twins (parallel/sharded_search.py *_many) and must still equal
        per-query search() exactly."""
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.parallel import mesh as mesh_mod
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file into key/value pairs."""\n'
            "    return dict(l.split('=') for l in open(path))\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget to the canvas."""\n'
            "    canvas.blit()\n\n"
            "def flush_buffer(buf):\n"
            '    """Write pending bytes out."""\n'
            "    buf.sync()\n"
        )
        mesh_mod.reset_corpus_mesh()
        try:
            stats = index(root, IndexOptions(quiet=True))
            queries = [
                "parse configuration file",
                "draw the widget",
                "flush_buffer pending bytes",
            ]
            s1 = SearchSession(stats.db_path, readonly=True)
            s1.fts.device_min_docs = 1
            assert s1.store._mesh() is not None, "mesh expected in test env"
            batched = s1.search_many(queries, SearchOptions(limit=5))
            s2 = SearchSession(stats.db_path, readonly=True)
            s2.fts.device_min_docs = 1
            sequential = [s2.search(q, SearchOptions(limit=5)) for q in queries]
            for b, s in zip(batched, sequential):
                assert [(h.chunk_id, round(h.score, 6)) for h in b.hits] == \
                       [(h.chunk_id, round(h.score, 6)) for h in s.hits]
                assert b.mode == s.mode
        finally:
            mesh_mod.reset_corpus_mesh()

    def test_cache_hits_short_circuit(self, tmp_path):
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text("def parse_config(p):\n    return p\n")
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        first = s.search("parse config", SearchOptions(limit=3))
        batched = s.search_many(["parse config"], SearchOptions(limit=3))
        assert batched[0].timings_ms.get("cached") is True
        assert [h.chunk_id for h in batched[0].hits] == \
               [h.chunk_id for h in first.hits]


class TestEmptyVectorStoreHybrid:
    def test_fused_defer_empty_store(self, tmp_path, monkeypatch):
        """Regression (r3 review, repro'd): a hybrid search against a store
        with zero valid rows but live FTS docs must return FTS-only results
        instead of crashing in the deferred-dispatch unpack."""
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.parallel import mesh as mesh_mod
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text("def parse_config(p):\n    return p\n")
        stats = index(root, IndexOptions(quiet=True))
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            sess = SearchSession(stats.db_path, readonly=True)
            sess.fts.device_min_docs = 1
            # tombstone every vector row, keep FTS alive
            ids = sess.store.all_ids()
            sess.store.readonly = False
            sess.store.delete_chunks(ids)
            sess.store.readonly = True
            resp = sess.search("parse config", SearchOptions(limit=5))
            assert resp.mode == "hybrid"
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()


class TestSearchManyEpochChange:
    def test_device_resync_between_preps_falls_back(self, tmp_path, monkeypatch):
        """If a writer re-syncs the resident FTS postings between two
        queries' preps, the stacked batch would index the wrong layout —
        search_many must detect the epoch change and fall back to
        per-query dispatch with correct results."""
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.parallel import mesh as mesh_mod
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file."""\n'
            "    return path\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget."""\n'
            "    canvas.blit()\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            s = SearchSession(stats.db_path, readonly=True)
            s.fts.device_min_docs = 1
            orig = s.fts.device_query_args
            calls = {"n": 0}

            def flaky(query, kind, limit):
                out = orig(query, kind, limit)
                calls["n"] += 1
                if calls["n"] == 1 and out is not None:
                    # simulate a writer re-sync: a NEW postings buffer
                    import jax.numpy as jnp

                    dev = out[0]
                    out = ((jnp.array(dev[0]),) + tuple(dev[1:]),) + out[1:]
                return out

            s.fts.device_query_args = flaky
            batched = s.search_many(
                ["parse configuration file", "draw the widget"],
                SearchOptions(limit=3),
            )
            s.fts.device_query_args = orig
            s2 = SearchSession(stats.db_path, readonly=True)
            s2.fts.device_min_docs = 1
            for b, q in zip(batched, ["parse configuration file",
                                      "draw the widget"]):
                want = s2.search(q, SearchOptions(limit=3))
                assert [(h.chunk_id, round(h.score, 6)) for h in b.hits] == \
                       [(h.chunk_id, round(h.score, 6)) for h in want.hits], q
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()


class TestSearchManyInt8:
    """Batched serving over an int8-quantized device corpus must equal
    per-query search on one device AND on the 8-device mesh (covers the
    *_many_int8 kernels end to end)."""

    def _build(self, tmp_path):
        from codesearch_tpu.index.pipeline import IndexOptions, index

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file into key/value pairs."""\n'
            "    return dict(l.split('=') for l in open(path))\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget to the canvas."""\n'
            "    canvas.blit()\n\n"
            "def flush_buffer(buf):\n"
            '    """Write pending bytes out."""\n'
            "    buf.sync()\n"
        )
        return index(root, IndexOptions(quiet=True, int8=True))

    def _assert_equiv(self, db_path):
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        queries = ["parse configuration file", "draw the widget",
                   "flush_buffer pending bytes"]
        s1 = SearchSession(db_path, readonly=True)
        s1.fts.device_min_docs = 1
        assert s1.store.int8
        batched = s1.search_many(queries, SearchOptions(limit=5))
        s2 = SearchSession(db_path, readonly=True)
        s2.fts.device_min_docs = 1
        for b, q in zip(batched, queries):
            want = s2.search(q, SearchOptions(limit=5))
            assert [(h.chunk_id, round(h.score, 5)) for h in b.hits] == \
                   [(h.chunk_id, round(h.score, 5)) for h in want.hits], q

    def test_single_device(self, tmp_path, monkeypatch):
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._build(tmp_path)
        monkeypatch.setenv("CODESEARCH_SINGLE_DEVICE", "1")
        mesh_mod.reset_corpus_mesh()
        try:
            self._assert_equiv(stats.db_path)
        finally:
            monkeypatch.delenv("CODESEARCH_SINGLE_DEVICE")
            mesh_mod.reset_corpus_mesh()

    def test_mesh(self, tmp_path):
        from codesearch_tpu.parallel import mesh as mesh_mod

        stats = self._build(tmp_path)
        mesh_mod.reset_corpus_mesh()
        try:
            self._assert_equiv(stats.db_path)
        finally:
            mesh_mod.reset_corpus_mesh()

    def test_bert_backend_int8_mesh(self, tmp_path):
        """The bert-family int8 batched hybrid (sharded encoder forward +
        int8 top-k + batched BM25) — the one *_many kernel combination the
        other tests don't reach."""
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.parallel import mesh as mesh_mod
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse a configuration file."""\n'
            "    return path\n\n"
            "def render_widget(canvas):\n"
            '    """Draw the widget."""\n'
            "    canvas.blit()\n"
        )
        stats = index(root, IndexOptions(quiet=True, int8=True,
                                         model="minilm-l6"))
        mesh_mod.reset_corpus_mesh()
        try:
            queries = ["parse configuration file", "draw the widget"]
            s1 = SearchSession(stats.db_path, readonly=True)
            s1.fts.device_min_docs = 1
            assert s1.store.int8 and s1.service.fused_kind() == "bert"
            batched = s1.search_many(queries, SearchOptions(limit=3))
            s2 = SearchSession(stats.db_path, readonly=True)
            s2.fts.device_min_docs = 1
            for b, q in zip(batched, queries):
                want = s2.search(q, SearchOptions(limit=3))
                assert [(h.chunk_id, round(h.score, 5)) for h in b.hits] == \
                       [(h.chunk_id, round(h.score, 5)) for h in want.hits], q
        finally:
            mesh_mod.reset_corpus_mesh()


class TestFederatedSearch:
    def test_search_all_repos(self, tmp_path, monkeypatch):
        """One query against every discoverable index (global registry),
        grouped per database; a broken db is reported, not fatal."""
        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path / "home"))
        repo_a = tmp_path / "alpha"
        repo_a.mkdir()
        (repo_a / "auth.py").write_text(
            "def authenticate_user(token):\n"
            '    """Validate a login token."""\n'
            "    return token == 'ok'\n"
        )
        repo_b = tmp_path / "beta"
        repo_b.mkdir()
        (repo_b / "render.py").write_text(
            "def render_widget(canvas):\n"
            '    """Draw the widget."""\n'
            "    canvas.blit()\n"
        )
        index(repo_a, IndexOptions(quiet=True, global_db=True))
        index(repo_b, IndexOptions(quiet=True, global_db=True))
        from codesearch_tpu.search import search_all

        grouped = search_all("authenticate user login", tmp_path,
                             SearchOptions(limit=3))
        assert len(grouped) == 2
        by_db = {db: resp for db, resp in grouped}
        hits = {db: [h.path for h in resp.hits]
                for db, resp in by_db.items()
                if not isinstance(resp, Exception)}
        assert len(hits) == 2
        # the repo that contains the answer surfaces it; grouping is per-db
        all_paths = [p for ps in hits.values() for p in ps]
        assert any("auth.py" in p for p in all_paths)

    def test_search_all_isolates_broken_db(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path / "home"))
        repo = tmp_path / "ok"
        repo.mkdir()
        (repo / "a.py").write_text("def parse_config(p):\n    return p\n")
        stats = index(repo, IndexOptions(quiet=True, global_db=True))
        # a second registered db that is corrupt
        from codesearch_tpu.index.db_discovery import register_global_db

        bad_root = tmp_path / "bad"
        bad_db = tmp_path / "home" / "dbs" / "bad.codesearch.db"
        bad_db.mkdir(parents=True)
        (bad_db / "metadata.json").write_text("{not json")
        register_global_db(bad_root, bad_db)
        from codesearch_tpu.search import search_all

        grouped = search_all("parse config", tmp_path, SearchOptions(limit=3))
        good = [r for _db, r in grouped if not isinstance(r, Exception)]
        assert good and good[0].hits
        assert stats.db_path  # good db resolved


class TestPhraseQueries:
    """Quoted spans are exact-phrase constraints (tantivy QueryParser
    parity): results must contain each phrase verbatim, case-insensitive."""

    def test_detect_phrases(self):
        from codesearch_tpu.search.analysis import detect_phrases

        assert detect_phrases('find "error handling" code') == ["error handling"]
        assert detect_phrases('"a b" and "c d"') == ["a b", "c d"]
        assert detect_phrases("no quotes here") == []
        assert detect_phrases('dangling " quote') == []

    def test_phrase_filters_results(self, tmp_path):
        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def handle_errors(e):\n"
            '    """Central error handling for the pipeline."""\n'
            "    raise e\n\n"
            "def handle_events(e):\n"
            '    """Event handling for errors in the UI loop."""\n'
            "    return e\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        # both chunks mention errors+handling; only one contains the phrase
        loose = s.search("error handling", SearchOptions(limit=5))
        assert len(loose.hits) == 2
        strict = s.search('"error handling"', SearchOptions(limit=5))
        assert len(strict.hits) == 1
        assert "error handling" in strict.hits[0].content.casefold()
        # a phrase present nowhere returns nothing (hard constraint)
        none = s.search('"handling error pipeline"', SearchOptions(limit=5))
        assert none.hits == []

    def test_phrase_filters_serving_readplane(self, tmp_path):
        from codesearch_tpu.embed import EmbeddingService
        from codesearch_tpu.index.manager import SharedStores
        from codesearch_tpu.index.pipeline import read_metadata
        from codesearch_tpu.server.readplane import ranked_chunks

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def handle_errors(e):\n"
            '    """Central error handling for the pipeline."""\n'
            "    raise e\n\n"
            "def handle_events(e):\n"
            '    """Event handling for errors in the UI loop."""\n'
            "    return e\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        meta = read_metadata(stats.db_path)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(stats.db_path, service.dims)
        try:
            with stores.lock:
                scored = ranked_chunks(
                    stores, service, meta, '"error handling"', 5
                )
            assert len(scored) == 1
            assert "error handling" in scored[0][2].content.casefold()
        finally:
            if lock:
                lock.release()


class TestExclusionQueries:
    def test_detect_exclusions(self):
        from codesearch_tpu.search.analysis import (
            detect_exclusions,
            detect_phrases,
        )

        assert detect_exclusions("parse config -test") == [("test", False)]
        assert detect_exclusions('errors -"unit test" -mock') == \
            [("unit test", True), ("mock", False)]
        # mid-word hyphens are NOT exclusions
        assert detect_exclusions("tree-sitter grammar") == []
        # punctuation/flag tokens are code, not operators
        assert detect_exclusions("convert vector -> list") == []
        assert detect_exclusions("parse --platform flag") == []
        # a minus inside a required phrase is literal text
        assert detect_exclusions('grep "foo -v bar"') == []
        from codesearch_tpu.search.analysis import parse_operators
        # exclusions are stripped from the retrieval text entirely
        retrieval, phrases, excl = parse_operators('error handling -test')
        assert retrieval == "error handling" and excl == [("test", False)]
        # phrase quotes are transparent to retrieval
        retrieval, reqs, _ = parse_operators('find "error handling" now')
        assert retrieval == "find error handling now"
        assert reqs == [("error handling", True)]
        # an excluded phrase is not also a required phrase
        assert detect_phrases('errors -"unit test"') == []

    def test_exclusion_filters_results(self, tmp_path):
        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def handle_errors(e):\n"
            '    """Central error handling for the pipeline."""\n'
            "    raise e\n\n"
            "def test_handle_errors(e):\n"
            '    """Unit test for error handling."""\n'
            "    assert handle_errors\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        loose = s.search("error handling", SearchOptions(limit=5))
        assert len(loose.hits) == 2
        strict = s.search("error handling -test", SearchOptions(limit=5))
        assert len(strict.hits) == 1
        assert "unit test" not in strict.hits[0].content.casefold()
        # token-boundary: -test must not exclude "latest" (substring only)
        (root / "b.py").write_text(
            "def latest_errors(e):\n"
            '    """Return the latest error handling snapshot."""\n'
            "    return e\n"
        )
        stats2 = index(root, IndexOptions(quiet=True))
        s2 = SearchSession(stats2.db_path, readonly=True)
        got = s2.search("error handling -test", SearchOptions(limit=5))
        paths = [h.path for h in got.hits]
        assert any("b.py" in p for p in paths), paths
        assert all("test_handle" not in h.content for h in got.hits)


class TestRequiredTermOperator:
    def test_plus_requires_token(self, tmp_path):
        from codesearch_tpu.search.analysis import parse_operators

        retrieval, reqs, excl = parse_operators("error handling +test")
        assert ("test", False) in reqs and excl == []
        assert retrieval == "error handling test"
        # code-shaped plus tokens are not operators
        assert parse_operators("count +1 items")[1] == []

        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def handle_errors(e):\n"
            '    """Central error handling for the pipeline."""\n'
            "    raise e\n\n"
            "def test_handle_errors(e):\n"
            '    """Unit test for error handling."""\n'
            "    assert handle_errors\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        got = s.search("error handling +test", SearchOptions(limit=5))
        assert len(got.hits) == 1
        assert "unit test" in got.hits[0].content.casefold()
        # required word matches on token boundaries: no "latest" smuggling
        (root / "b.py").write_text(
            "def latest_errors(e):\n"
            '    """Latest error handling snapshot."""\n'
            "    return e\n"
        )
        stats2 = index(root, IndexOptions(quiet=True))
        s2 = SearchSession(stats2.db_path, readonly=True)
        got2 = s2.search("error handling +test", SearchOptions(limit=5))
        assert all("test" in h.content.casefold().split() or
                   "test_handle_errors" in h.content for h in got2.hits)


class TestHostFastPath:
    """Small corpora score entirely on host numpy (constants.HOST_PATH_ROWS):
    a one-shot process pays >1 s tracing/loading the fused executable even
    on warm caches, while an 8k-row fp32 matmul is single-digit ms."""

    def _mk(self, tmp_path):
        root = tmp_path / "repo"
        root.mkdir()
        (root / "a.py").write_text(
            "def parse_config(path):\n"
            '    """Parse configuration values from a file."""\n'
            "    return dict(line.split('=') for line in open(path))\n\n"
            "def watch_files(root):\n"
            '    """Watch the tree for filesystem events."""\n'
            "    return []\n"
        )
        (root / "b.py").write_text(
            "class ErrorHandler:\n"
            '    """Central error handling."""\n'
            "    def handle(self, e):\n"
            "        raise e\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        return stats.db_path

    def test_small_corpus_runs_with_zero_device_dispatches(
        self, tmp_path, monkeypatch
    ):
        db = self._mk(tmp_path)
        import codesearch_tpu.ops.query_pipeline as qp

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("device dispatch on the host fast path")

        for name in (
            "hash_embed_search", "hash_embed_search_int8",
            "hash_embed_hybrid_search", "hash_embed_hybrid_search_int8",
        ):
            monkeypatch.setattr(qp, name, boom)
        s = SearchSession(db, readonly=True)
        assert s.store.wants_host_path()
        got = s.search("parse configuration values", SearchOptions(limit=5))
        assert got.hits and "parse_config" in got.hits[0].content
        # hybrid mode: the BM25 leg routed to host too (device floor)
        assert got.mode == "hybrid"
        # vector-only mode rides the same host path
        got_v = s.search(
            "error handling", SearchOptions(limit=5, mode="vector")
        )
        assert got_v.hits and any(
            "ErrorHandler" in h.content for h in got_v.hits
        )

    def test_host_ranking_matches_device(self, tmp_path):
        db = self._mk(tmp_path)
        host = SearchSession(db, readonly=True)
        assert host.store.wants_host_path()
        dev = SearchSession(db, readonly=True)
        dev.store.host_path_rows = 0          # force the device plane
        assert not dev.store.wants_host_path()
        for q in ("parse configuration values", "watch filesystem events",
                  "error handling"):
            h = host.search(q, SearchOptions(limit=5))
            d = dev.search(q, SearchOptions(limit=5))
            assert [x.chunk_id for x in h.hits] == [x.chunk_id for x in d.hits]
            for a, b in zip(h.hits, d.hits):
                # host accumulates fp32 where the device matmul is bf16
                assert abs(a.score - b.score) < 2e-2

    def test_wave_equals_per_query_on_host_path(self, tmp_path):
        db = self._mk(tmp_path)
        s = SearchSession(db, readonly=True)
        queries = ["parse configuration values", "error handling"]
        wave = s.search_many(queries, SearchOptions(limit=5))
        s2 = SearchSession(db, readonly=True)
        single = [s2.search(q, SearchOptions(limit=5)) for q in queries]
        for w, g in zip(wave, single):
            assert [x.chunk_id for x in w.hits] == [x.chunk_id for x in g.hits]

    def test_fts_device_floor_routes_query_args_to_host(self, tmp_path):
        db = self._mk(tmp_path)
        s = SearchSession(db, readonly=True)
        # default floor (50k) — a tiny corpus never builds device postings
        assert s.fts.device_query_args("parse config", None, 10) is None
        assert s.fts._dev is None
        # forcing the floor down re-enables the device leg (test convention)
        s.fts.device_min_docs = 1
        assert s.fts.device_query_args("parse config", None, 10) is not None


class TestTestPathDemotion:
    """Test-convention files are demoted at the boost stage unless the
    query itself asks about tests (beyond the reference: its labeled sets
    show tests restating query terms and outranking the implementation)."""

    def test_is_test_path(self):
        from codesearch_tpu.search.analysis import is_test_path

        for p in ("tests/test_fts.py", "a/b/test/util.go", "conftest.py",
                  "src/__tests__/app.tsx", "pkg/store_test.go",
                  "web/app.spec.ts", "web/app.test.ts",
                  "src/FooTest.java", "Specs/ParserSpec.cs"):
            assert is_test_path(p), p
        for p in ("src/store.py", "latest.py", "contest.js", "attest.go",
                  "src/protest/x.py", "testament/scroll.py",
                  "detesting.rs", "src/testing.py"):
            assert not is_test_path(p), p

    def test_query_wants_tests(self):
        from codesearch_tpu.search.analysis import query_wants_tests

        assert query_wants_tests("unit tests for the chunker")
        assert query_wants_tests("where do we mock the embedder")
        assert query_wants_tests("pytest fixtures for stores")
        assert not query_wants_tests("where do we detect binary files")
        assert not query_wants_tests("latest protest attestation")

    def test_implementation_outranks_test(self, tmp_path):
        root = tmp_path / "repo"
        (root / "tests").mkdir(parents=True)
        (root / "binary.py").write_text(
            "def detect_binary(path):\n"
            '    """Detect binary files by null bytes."""\n'
            "    return b'\\0' in open(path, 'rb').read(512)\n"
        )
        (root / "tests" / "test_binary.py").write_text(
            "def test_detect_binary_files(tmp_path):\n"
            '    """Test that we detect binary files correctly."""\n'
            "    assert detect_binary\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        got = s.search("detect binary files", SearchOptions(limit=2))
        assert got.hits and got.hits[0].path.endswith("binary.py"), \
            [h.path for h in got.hits]
        # a test-intent query keeps the test file competitive (no penalty)
        got_t = s.search("test that binary files are detected",
                         SearchOptions(limit=2))
        assert any("test_binary.py" in h.path for h in got_t.hits)


class TestDocPathDemotion:
    """Doc-convention files are demoted at the boost stage unless the query
    itself asks about documentation (beyond the reference: its own
    improvement-plan records README/BM25 prose outranking code for
    documentation-phrased queries)."""

    def test_is_doc_path(self):
        from codesearch_tpu.search.analysis import is_doc_path

        for p in ("README.md", "docs/guide.html", "doc/api/index.html",
                  "CHANGELOG", "LICENSE-MIT", "notes.txt", "a/b/design.rst",
                  "wiki/Home.adoc", "INSTALL", "contributing.md"):
            assert is_doc_path(p), p
        for p in ("src/store.py", "src/docstring.py", "readme_parser.go",
                  "mandoline/cut.rs", "src/document.ts", "install.sh.c",
                  "install_utils.py", "news_feed.rs", "todo_list.ts",
                  "license_check.py", "notice_handler.rs", "install.sh",
                  "readme-parser.go", "requirements.txt", "CMakeLists.txt",
                  "requirements-dev.txt", "constraints.txt"):
            assert not is_doc_path(p), p

    def test_query_wants_docs(self):
        from codesearch_tpu.search.analysis import query_wants_docs

        assert query_wants_docs("update the readme")
        assert query_wants_docs("where is the installation guide")
        assert query_wants_docs("documentation for the chunker")
        assert not query_wants_docs("where do we detect binary files")
        assert not query_wants_docs("parse the document tree")

    def test_code_outranks_doc(self, tmp_path):
        root = tmp_path / "repo"
        root.mkdir(parents=True)
        (root / "watcher.py").write_text(
            "def refresh_incremental(changed):\n"
            '    """Incremental indexing: re-embed only changed files."""\n'
            "    return [embed(f) for f in changed]\n"
        )
        # a couple of unrelated code files so the corpus has a realistic
        # code-majority primary language (a 1:1 md:py corpus is a tie)
        (root / "util.py").write_text(
            "def clamp(x, lo, hi):\n    return min(max(x, lo), hi)\n"
        )
        (root / "colors.py").write_text(
            "PALETTE = {'red': '#f00', 'green': '#0f0'}\n"
        )
        (root / "README.md").write_text(
            "# Incremental indexing\n\n"
            "Incremental indexing re-embeds only changed files. The watcher\n"
            "batches changed files and the index updates in place.\n"
        )
        stats = index(root, IndexOptions(quiet=True))
        s = SearchSession(stats.db_path, readonly=True)
        got = s.search("incremental indexing of changed files",
                       SearchOptions(limit=2))
        assert got.hits and got.hits[0].path.endswith("watcher.py"), \
            [h.path for h in got.hits]
        # a docs-intent query keeps the README competitive (no penalty)
        got_d = s.search("readme section about incremental indexing",
                         SearchOptions(limit=2))
        assert any(h.path.endswith("README.md") for h in got_d.hits)


class TestScorePlanesE2E:
    """Round-4 resident score planes, end to end through the fused read
    plane: high-df terms routed to planes must not change results vs the
    chunk-gather device path, in search() and in search_many() waves."""

    def _index(self, tmp_path):
        from codesearch_tpu.index.pipeline import IndexOptions, index

        root = tmp_path / "repo"
        root.mkdir()
        # 60 functions all referencing `shared_util` → high df for the
        # identifier and its subtokens; distinct rare names per function
        src = "\n".join(
            f"def handler_{i}(arg):\n"
            f'    """Handle case {i} via the dispatcher."""\n'
            f"    return shared_util.apply(arg, {i})\n"
            for i in range(60)
        )
        (root / "handlers.py").write_text(src)
        (root / "other.py").write_text(
            "def parse_config(path):\n"
            '    """Parse configuration values."""\n'
            "    return shared_util.load(path)\n"
        )
        return index(root, IndexOptions(quiet=True))

    def _session(self, db_path, floor):
        from codesearch_tpu.search.pipeline import SearchSession

        sess = SearchSession(db_path, readonly=True)
        sess.store.host_path_rows = 0
        sess.fts.device_min_docs = 1
        sess.fts.plane_df_floor = floor
        return sess

    def test_fused_planes_match_chunk_path(self, tmp_path):
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        q = "handler dispatcher shared_util"
        base_sess = self._session(stats.db_path, floor=10)
        base_sess.fts.planes_enabled = False
        base = base_sess.search(q, SearchOptions(limit=5))
        sess = self._session(stats.db_path, floor=10)
        got = sess.search(q, SearchOptions(limit=5))
        assert sess.fts.plane_builds >= 1, "planes must route"
        assert [h.chunk_id for h in got.hits] == [h.chunk_id for h in base.hits]
        for g, b in zip(got.hits, base.hits):
            assert abs(g.score - b.score) < 1e-4

    def test_search_many_matches_search_with_planes(self, tmp_path):
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        sess = self._session(stats.db_path, floor=10)
        queries = ["handler dispatcher shared_util",
                   "parse configuration values",
                   "apply the shared_util case"]
        singles = [sess.search(q, SearchOptions(limit=5)) for q in queries]
        fresh = self._session(stats.db_path, floor=10)
        wave = fresh.search_many(queries, SearchOptions(limit=5))
        for s, w in zip(singles, wave):
            assert [h.chunk_id for h in w.hits] == [h.chunk_id for h in s.hits]

    def test_search_oom_releases_planes_and_retries(self, tmp_path,
                                                    monkeypatch):
        """A device RESOURCE_EXHAUSTED during the fused dispatch must
        release the score planes and retry on the sparse leg instead of
        failing the query (the HBM-pressure degrade observed at 10M rows:
        int8 matrix + postings + plane buffer crowd a fresh executable's
        workspace)."""
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        sess = self._session(stats.db_path, floor=10)
        real = sess.store.hybrid_search_featurized
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Error allocating device buffer: "
                    "Attempting to allocate 6.40G. That was not possible."
                )
            return real(*a, **k)

        monkeypatch.setattr(sess.store, "hybrid_search_featurized", flaky)
        resp = sess.search("handler dispatcher shared_util",
                           SearchOptions(limit=5))
        assert resp.hits
        assert sess.fts.planes_enabled is False
        assert calls["n"] >= 2
        # results still match a planes-off baseline exactly
        base = self._session(stats.db_path, floor=10)
        base.fts.planes_enabled = False
        want = base.search("handler dispatcher shared_util",
                           SearchOptions(limit=5))
        assert [h.chunk_id for h in resp.hits] == [
            h.chunk_id for h in want.hits]

    def test_search_many_oom_releases_planes_and_retries(self, tmp_path,
                                                         monkeypatch):
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        sess = self._session(stats.db_path, floor=10)
        real = sess.store.hybrid_search_featurized_many
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Error allocating device buffer: "
                    "Attempting to allocate 6.40G. That was not possible."
                )
            return real(*a, **k)

        monkeypatch.setattr(
            sess.store, "hybrid_search_featurized_many", flaky)
        queries = ["handler dispatcher shared_util",
                   "parse configuration values"]
        wave = sess.search_many(queries, SearchOptions(limit=5))
        assert len(wave) == 2 and all(r.hits for r in wave)
        assert sess.fts.planes_enabled is False
        assert calls["n"] >= 2
        # wave results equal per-query search() on a planes-off session
        base = self._session(stats.db_path, floor=10)
        base.fts.planes_enabled = False
        for q, w in zip(queries, wave):
            s = base.search(q, SearchOptions(limit=5))
            assert [h.chunk_id for h in w.hits] == [
                h.chunk_id for h in s.hits]

    def test_non_oom_errors_still_raise(self, tmp_path, monkeypatch):
        """The degrade path must not swallow unrelated dispatch errors."""
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        sess = self._session(stats.db_path, floor=10)

        def broken(*a, **k):
            raise RuntimeError("INTERNAL: something else entirely")

        monkeypatch.setattr(sess.store, "hybrid_search_featurized", broken)
        with pytest.raises(RuntimeError, match="INTERNAL"):
            sess.search("handler dispatcher shared_util",
                        SearchOptions(limit=5))
        assert sess.fts.planes_enabled is True

    def test_grpc_resource_exhausted_is_not_oom(self, tmp_path, monkeypatch):
        """RESOURCE_EXHAUSTED without a memory keyword (the tunneled
        backend reuses the status for gRPC quota/message-size errors) must
        NOT disable score planes — that would silently degrade every later
        high-df query (ADVICE r4)."""
        from codesearch_tpu.search.pipeline import SearchOptions

        stats = self._index(tmp_path)
        sess = self._session(stats.db_path, floor=10)

        def quota(*a, **k):
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Received message larger than max "
                "(45000000 vs. 4194304)"
            )

        monkeypatch.setattr(sess.store, "hybrid_search_featurized", quota)
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            sess.search("handler dispatcher shared_util",
                        SearchOptions(limit=5))
        assert sess.fts.planes_enabled is True

    def test_serving_wave_oom_releases_planes_and_retries(
            self, tmp_path, monkeypatch):
        """The serving read plane (MCP/HTTP via readplane) must get the
        same OOM degrade as the session pipeline (ADVICE r4): a device
        RESOURCE_EXHAUSTED in the wave dispatch releases planes and the
        retry serves the request instead of failing it."""
        from codesearch_tpu.embed import EmbeddingService
        from codesearch_tpu.index.manager import SharedStores
        from codesearch_tpu.index.pipeline import read_metadata
        from codesearch_tpu.server.readplane import ranked_chunks_many

        stats = self._index(tmp_path)
        metadata = read_metadata(stats.db_path)
        service = EmbeddingService(metadata["model"])
        stores = SharedStores(stats.db_path, service.dims, readonly=True)
        stores.store.host_path_rows = 0
        stores.fts.device_min_docs = 1
        stores.fts.plane_df_floor = 10
        real = stores.store.hybrid_search_featurized_many
        calls = {"n": 0}

        def flaky(*a, **k):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Error allocating device "
                    "buffer: Attempting to allocate 6.40G."
                )
            return real(*a, **k)

        monkeypatch.setattr(
            stores.store, "hybrid_search_featurized_many", flaky)
        waves = ranked_chunks_many(
            stores, service, metadata,
            ["handler dispatcher shared_util",
             "parse configuration values"], 5,
        )
        assert len(waves) == 2 and all(waves)
        assert stores.fts.planes_enabled is False
        assert calls["n"] >= 2
