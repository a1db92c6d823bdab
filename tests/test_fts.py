"""FTS store tests: BM25 semantics, exact lookup, CSR merge/persist,
deletes, scale smoke."""

import numpy as np
import pytest

from codesearch_tpu.fts import FtsStore


@pytest.fixture()
def store(tmp_path):
    s = FtsStore(tmp_path / "fts")
    s.add_chunk(1, "fn parse_config reads the config file", "a.rs",
                "fn parse_config(path: &str)", "Function")
    s.add_chunk(2, "fn draw_triangle renders graphics on canvas", "b.rs",
                "fn draw_triangle(c: &mut Canvas)", "Function")
    s.add_chunk(3, "struct Config holds parsed settings values", "c.rs",
                "struct Config", "Struct")
    s.commit()
    return s


class TestSearch:
    def test_bm25_relevance(self, store):
        res = store.search("parse config file")
        assert res and res[0].chunk_id == 1

    def test_signature_terms_boosted(self, store):
        # 'triangle' appears in both content and signature of doc 2
        res = store.search("draw_triangle")
        assert res[0].chunk_id == 2

    def test_kind_boost(self, store):
        plain = store.search("config")
        boosted = store.search("config", boost_kind="Struct")
        assert boosted[0].chunk_id == 3
        by_id_p = {r.chunk_id: r.score for r in plain}
        by_id_b = {r.chunk_id: r.score for r in boosted}
        assert by_id_b[3] > by_id_p[3] * 2.5

    def test_no_match(self, store):
        assert store.search("zzzzqqq") == []

    def test_uncommitted_postings_visible(self, store):
        store.add_chunk(9, "fresh uncommitted chunk about kubernetes", "k.rs")
        res = store.search("kubernetes")
        assert res and res[0].chunk_id == 9


class TestExact:
    def test_signature_hits_beat_content(self, store):
        store.add_chunk(4, "call parse_config from here", "d.rs", None, "Function")
        store.commit()
        res = store.search_exact("parse_config")
        assert res[0].chunk_id == 1  # signature hit ranks above content-only
        assert any(r.chunk_id == 4 for r in res)

    def test_kind_filter(self, store):
        res = store.search_exact("Config", kind="Struct")
        assert all(r.kind == "Struct" for r in res)

    def test_no_identifier(self, store):
        assert store.search_exact("a b") == []


class TestLifecycle:
    def test_delete_removes(self, store):
        store.delete_chunk(1)
        res = store.search("parse config")
        assert all(r.chunk_id != 1 for r in res)

    def test_replace_same_id(self, store):
        store.add_chunk(1, "completely different quantum content", "a.rs",
                        "fn quantum()", "Function")
        res = store.search("quantum")
        assert res and res[0].chunk_id == 1
        res_old = store.search("parse config file")
        assert all(r.chunk_id != 1 for r in res_old)

    def test_persist_reopen(self, tmp_path, store):
        store.commit()
        s2 = FtsStore(store.dir)
        res = s2.search("parse config file")
        assert res and res[0].chunk_id == 1
        assert len(s2) == 3

    def test_clear(self, store):
        store.clear()
        assert len(store) == 0
        assert store.search("config") == []
        s2 = FtsStore(store.dir)
        assert len(s2) == 0

    def test_stats(self, store):
        st = store.stats()
        assert st["docs"] == 3
        assert st["terms"] > 0
        assert st["disk_bytes"] > 0


class TestScale:
    def test_100k_docs_smoke(self, tmp_path):
        """Columnar postings must handle 100k docs in reasonable time."""
        import time

        s = FtsStore(tmp_path / "big")
        t0 = time.time()
        for i in range(100_000):
            s.add_chunk(i, f"function body_{i % 1000} compute value", f"f{i}.rs",
                        f"fn body_{i % 1000}()", "Function")
        add_s = time.time() - t0
        t0 = time.time()
        s.commit()
        commit_s = time.time() - t0
        t0 = time.time()
        res = s.search("body_42 compute")
        search_s = time.time() - t0
        assert res
        assert add_s < 120 and commit_s < 60 and search_s < 5, (
            f"add {add_s:.1f}s commit {commit_s:.1f}s search {search_s:.1f}s"
        )
