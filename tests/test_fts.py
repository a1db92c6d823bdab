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

    def test_definition_beats_heavy_caller(self, store):
        """tf saturation + length norm (tantivy TermQuery semantics): a long
        chunk that *calls* an identifier many times must not outrank the
        short chunk whose *signature* defines it (tantivy_store.rs:460-524)."""
        filler = " ".join(f"word{i}" for i in range(40))
        store.add_chunk(
            7,
            f"VectorStore VectorStore VectorStore VectorStore VectorStore "
            f"VectorStore VectorStore usage everywhere {filler}",
            "caller.rs", None, "Function",
        )
        store.add_chunk(8, "store implementation", "def.rs",
                        "pub struct VectorStore", "Struct")
        store.commit()
        res = store.search_exact("VectorStore")
        assert res[0].chunk_id == 8
        assert any(r.chunk_id == 7 for r in res)


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


class TestSegments:
    """Round-2: LSM-style segments — commits sort only new postings and
    persistence appends; merges are geometric (amortized O(n log n))."""

    def test_commit_creates_segments_and_merges(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        for batch in range(6):
            for i in range(50):
                cid = batch * 50 + i
                s.add_chunk(cid, f"alpha beta gamma_{cid} delta", f"f{cid}.rs",
                            f"fn gamma_{cid}()", "Function")
            s.commit()
        st = s.stats()
        assert st["docs"] == 300
        assert 1 <= st["segments"] <= 12
        # results are correct across segments
        res = s.search("gamma_123")
        assert res and res[0].chunk_id == 123
        s2 = FtsStore(tmp_path / "fts")
        assert len(s2) == 300
        assert s2.search("gamma_7")[0].chunk_id == 7

    def test_docidx_appends_between_commits(self, tmp_path):
        from codesearch_tpu.fts.store import DOCIDX_DTYPE

        s = FtsStore(tmp_path / "fts")
        for i in range(100):
            s.add_chunk(i, f"content token_{i}", f"f{i}.rs")
        s.commit()
        idx0 = (s.dir / "docidx.bin").stat().st_size
        assert idx0 == 100 * DOCIDX_DTYPE.itemsize
        s.add_chunk(100, "one more doc", "g.rs")
        s.commit()
        # exactly 1 fixed-width record appended, not a rewrite of 101
        assert (s.dir / "docidx.bin").stat().st_size == idx0 + DOCIDX_DTYPE.itemsize
        s2 = FtsStore(tmp_path / "fts")
        assert len(s2) == 101
        assert s2.search("token_42")[0].chunk_id == 42

    def test_device_path_matches_host(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        rng = np.random.default_rng(0)
        words = [f"tok{i}" for i in range(50)]
        for i in range(500):
            body = " ".join(rng.choice(words, size=12))
            s.add_chunk(i, body, f"f{i}.rs",
                        f"fn {words[i % 50]}()", "Function" if i % 3 else "Struct")
        s.commit()
        host = s.search("tok7 tok12 tok3", limit=10, boost_kind="Struct")
        s.device_min_docs = 1  # force the device scatter+topk path
        dev = s.search("tok7 tok12 tok3", limit=10, boost_kind="Struct")
        # same score sequence (ties may permute between host argsort and
        # device top_k; f32 vs f64 accumulation differs in the last ulps)
        assert len(host) == len(dev) == 10
        for h, d in zip(host, dev):
            assert d.score == pytest.approx(h.score, rel=1e-4)
        assert host[0].chunk_id == dev[0].chunk_id

    def test_many_interval_query_falls_back_to_host(self, tmp_path, monkeypatch):
        """Queries whose (term × segment) interval count exceeds the device
        cap must still return results via the host path (the kernel's run
        reduction is bounded by imax — such queries would compile huge
        programs)."""
        import codesearch_tpu.fts.store as fstore

        s = FtsStore(tmp_path / "fts")
        words = [f"kw{i}" for i in range(12)]
        # many segments: commit per small batch so each term spans segments
        for b in range(6):
            for i in range(40):
                cid = b * 40 + i
                s.add_chunk(cid, " ".join(words), f"f{cid}.rs")
            s.commit()
        q = " ".join(words)
        expected = s.search(q, limit=5)
        monkeypatch.setattr(fstore, "MAX_DEVICE_INTERVALS", 2)
        s.device_min_docs = 1
        got = s.search(q, limit=5)   # device args refused → host scoring
        assert [r.chunk_id for r in got] == [r.chunk_id for r in expected]

    def test_many_interval_query_runs_on_device(self, tmp_path):
        """Round-3: the log-pass segmented scan lifts the interval cap —
        a 12-term query over 6 segments (72 intervals, past the old cap of
        32) must take the device path and match host scoring exactly."""
        s = FtsStore(tmp_path / "fts")
        words = [f"kw{i}" for i in range(12)]
        for b in range(6):
            for i in range(40):
                cid = b * 40 + i
                # each doc carries 4 of the 12 terms → df ≈ 33% (under the
                # MAX_DF_RATIO stopword cap) while every term spans all
                # 6 segments
                mine = [words[(cid + o) % 12] for o in (0, 1, 3, 5)]
                s.add_chunk(cid, " ".join(mine) + " pad", f"f{cid}.rs",
                            f"fn kw{cid % 12}()", "Function")
            s.commit()
        q = " ".join(words)
        host = s.search(q, limit=8, boost_kind="Function")
        s.device_min_docs = 1
        args = s.device_query_args(q, "Function", 8)
        assert args is not None, "72 intervals must stay on device now"
        dev = s.search(q, limit=8, boost_kind="Function")
        assert len(dev) == len(host)
        for h, d in zip(host, dev):
            assert d.score == pytest.approx(h.score, rel=1e-4)

    def test_deletes_purged_at_merge(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        for i in range(100):
            s.add_chunk(i, f"word_{i} filler text", f"f{i}.rs")
        s.commit()
        for i in range(50):
            s.delete_chunk(i)
        for i in range(100, 220):
            s.add_chunk(i, f"word_{i} filler text", f"f{i}.rs")
        s.commit()  # merge policy folds — dead postings drop
        # 'word_3' subtokens ('word') match live docs, but chunk 3 is gone
        assert all(r.chunk_id != 3 for r in s.search("word_3", limit=200))
        assert s.search("word_150")[0].chunk_id == 150
        s2 = FtsStore(tmp_path / "fts")
        assert len(s2) == 170
        assert all(r.chunk_id != 3 for r in s2.search("word_3", limit=200))

    def test_run_level_merge_matches_resort_reference(self, tmp_path):
        """r5: _merge_segments is a run-level scatter merge (no per-posting
        re-sort). Its output must stay BYTE-identical — terms, offsets, and
        per-run posting order — to the old concatenate+stable-argsort
        algorithm, with and without dead postings in the victims."""
        from codesearch_tpu.fts.store import Segment

        def reference_merge(store, victims):
            # the pre-r5 algorithm, verbatim
            terms = np.concatenate([s.flat_terms() for s in victims])
            dnums = np.concatenate([np.asarray(s.dnums) for s in victims])
            tfc = np.concatenate([np.asarray(s.tfc) for s in victims])
            tfs = np.concatenate([np.asarray(s.tfs) for s in victims])
            live = store._liveness(dnums)
            if not live.all():
                terms, dnums = terms[live], dnums[live]
                tfc, tfs = tfc[live], tfs[live]
            order = np.argsort(terms, kind="stable")
            terms, dnums = terms[order], dnums[order]
            tfc, tfs = tfc[order], tfs[order]
            uniq, counts = np.unique(terms, return_counts=True)
            offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
            if len(dnums) and int(dnums.max()) < (1 << 31):
                dnums = dnums.astype(np.int32)
            return Segment(uniq, offsets, dnums,
                           np.clip(tfc, 0, 32767).astype(np.int16),
                           np.clip(tfs, 0, 32767).astype(np.int16))

        def assert_equal(a: Segment, b: Segment):
            np.testing.assert_array_equal(a.terms, b.terms)
            np.testing.assert_array_equal(a.offsets, b.offsets)
            np.testing.assert_array_equal(np.asarray(a.dnums),
                                          np.asarray(b.dnums))
            assert np.asarray(a.dnums).dtype == np.asarray(b.dnums).dtype
            np.testing.assert_array_equal(np.asarray(a.tfc), np.asarray(b.tfc))
            np.testing.assert_array_equal(np.asarray(a.tfs), np.asarray(b.tfs))

        rng = np.random.default_rng(7)
        words = [f"w{i}" for i in range(40)]
        s = FtsStore(tmp_path / "fts")
        for i in range(300):
            body = " ".join(rng.choice(words, size=8))
            s.add_chunk(i, body, f"f{i // 16}.rs",
                        f"fn {words[i % 40]}()", "Function")
        s._flush_mem()
        seg_a = s._segments[-1]
        for i in range(300, 500):
            # overlapping + fresh terms in the second segment
            body = " ".join(rng.choice(words, size=8)) + f" only_{i}"
            s.add_chunk(i, body, f"g{i // 16}.rs")
        s._flush_mem()
        seg_b = s._segments[-1]
        # no-dead fast path (liveness gather skipped entirely)
        assert s._doc_dnum.n == s._n_live
        assert_equal(s._merge_segments([seg_b, seg_a]),
                     reference_merge(s, [seg_b, seg_a]))
        # dead postings present: filtered path, including terms whose every
        # posting dies (only_N appears in exactly one doc)
        for i in list(range(0, 300, 7)) + [311, 312]:
            s.delete_chunk(i)
        assert s._doc_dnum.n != s._n_live
        assert_equal(s._merge_segments([seg_b, seg_a]),
                     reference_merge(s, [seg_b, seg_a]))
        # empty-victim edge
        empty = Segment.from_triples(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.int32), np.zeros(0, np.int32))
        assert_equal(s._merge_segments([seg_a, empty]),
                     reference_merge(s, [seg_a, empty]))

    def test_from_triples_matches_np_unique(self):
        """r5: from_triples' run-boundary unique must equal np.unique."""
        from codesearch_tpu.fts.store import Segment

        rng = np.random.default_rng(3)
        terms = rng.integers(0, 50, size=400).astype(np.int64)
        dnums = np.arange(400, dtype=np.int64)
        tf = rng.integers(1, 9, size=400).astype(np.int32)
        seg = Segment.from_triples(terms, dnums, tf, tf)
        uniq, counts = np.unique(terms, return_counts=True)
        np.testing.assert_array_equal(seg.terms, uniq)
        np.testing.assert_array_equal(
            seg.offsets, np.concatenate([[0], np.cumsum(counts)]))
        # per-run postings keep first-occurrence (stable) order
        for t in uniq[:5]:
            lo, hi = seg.term_range(int(t))
            np.testing.assert_array_equal(
                np.asarray(seg.dnums[lo:hi]), dnums[terms == t])

    def test_legacy_v2_layout_migrates(self, tmp_path):
        import msgpack
        d = tmp_path / "fts"
        d.mkdir()
        # hand-build the round-1 single-CSR layout
        from codesearch_tpu.fts.store import term_keys
        docs, terms, pdocs, tfc, tfs = {}, [], [], [], []
        for cid, text in [(5, "legacy alpha content"), (9, "legacy beta content")]:
            keys = term_keys(text)
            docs[cid] = [len(keys), "Function", f"f{cid}.rs"]
            uniq, counts = np.unique(keys, return_counts=True)
            terms.extend(uniq.tolist())
            pdocs.extend([cid] * len(uniq))
            tfc.extend(counts.tolist())
            tfs.extend([0] * len(uniq))
        order = np.argsort(terms, kind="stable")
        terms = np.asarray(terms, np.int64)[order]
        uniq, counts = np.unique(terms, return_counts=True)
        np.savez(d / "postings.npz",
                 uniq_terms=uniq,
                 offsets=np.concatenate([[0], np.cumsum(counts)]).astype(np.int64),
                 p_docs=np.asarray(pdocs, np.int64)[order],
                 p_tfc=np.asarray(tfc, np.int32)[order],
                 p_tfs=np.asarray(tfs, np.int32)[order])
        with open(d / "index.msgpack", "wb") as f:
            msgpack.pack({"docs": docs, "version": 2}, f)
        s = FtsStore(d)
        assert len(s) == 2
        assert s.search("alpha")[0].chunk_id == 5
        s.commit()  # migrates
        assert not (d / "index.msgpack").exists()
        assert (d / "fts.json").exists()
        s2 = FtsStore(d)
        assert s2.search("beta")[0].chunk_id == 9


class TestBatchIngest:
    def test_add_chunks_matches_add_chunk(self, tmp_path):
        """The vectorized slab path must be posting-identical to the
        per-row path: same scores, same exact-match results."""
        rows = []
        for i in range(60):
            rows.append((i, f"alpha beta_{i % 7} gamma {'extra ' * (i % 3)}",
                         f"f{i}.rs", f"fn beta_{i % 7}()" if i % 2 else None,
                         "Function" if i % 2 else "Struct"))
        a = FtsStore(tmp_path / "a")
        for r in rows:
            a.add_chunk(*r)
        a.commit()
        b = FtsStore(tmp_path / "b")
        b.add_chunks(rows)
        b.commit()
        assert a.stats()["postings"] == b.stats()["postings"]
        for q in ("alpha gamma", "beta_3", "extra alpha"):
            ra = [(r.chunk_id, round(r.score, 6)) for r in a.search(q)]
            rb = [(r.chunk_id, round(r.score, 6)) for r in b.search(q)]
            assert ra == rb
        ea = [(r.chunk_id, r.score) for r in a.search_exact("beta_3")]
        eb = [(r.chunk_id, r.score) for r in b.search_exact("beta_3")]
        assert ea == eb

    def test_add_chunks_replaces_existing(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        s.add_chunk(1, "old content here", "a.rs")
        s.add_chunks([(1, "new content here", "a.rs", None, "")])
        s.commit()
        assert len(s) == 1
        assert s.search("new")[0].chunk_id == 1
        assert s.search("old") == []

    def test_add_chunks_intra_slab_duplicate_ids(self, tmp_path):
        """The same chunk id twice in ONE slab: last write wins (per-row
        replace semantics, not two live docs)."""
        s = FtsStore(tmp_path / "fts")
        s.add_chunks([
            (5, "first version alpha", "a.rs", None, ""),
            (6, "other doc beta", "b.rs", None, ""),
            (5, "second version gamma", "a.rs", None, ""),
        ])
        s.commit()
        assert len(s) == 2
        assert s.search("alpha") == []
        assert s.search("gamma")[0].chunk_id == 5

    def test_bulk_ingest_then_delete_and_replace(self, tmp_path):
        """Slot overlay written by the bulk fresh path must serve
        delete_chunk and later re-adds exactly like the per-row path."""
        s = FtsStore(tmp_path / "fts")
        rows = [(i, f"zzztok{i} shared", f"src/m{i // 4}.py",
                 f"def f_{i}()", "Function") for i in range(32)]
        s.add_chunks(rows)
        s.delete_chunk(7)
        assert s.search("zzztok7") == []
        assert len(s) == 31
        # re-add via the batch API → routes through the replace fallback
        s.add_chunks([(3, "replacement body zeta", "src/m0.py", None, "")])
        s.commit()
        assert len(s) == 31
        assert s.search("zeta")[0].chunk_id == 3
        assert s.search("zzztok3") == []
        # path/kind interning survived the bulk path
        hit = s.search("zzztok9")[0]
        assert hit.path == "src/m2.py" and hit.kind == "Function"


class TestCrashRecovery:
    """The manifest rename is the single commit point: anything written
    after it (doclog bytes, segment files) must be invisible/pruned on the
    next open, and corrupt files must degrade, not crash."""

    def _populated(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        for i in range(20):
            s.add_chunk(i, f"alpha token_{i} beta", f"f{i}.rs",
                        f"fn token_{i}()", "Function")
        s.commit()
        return s

    def test_v3_doclog_layout_migrates(self, tmp_path):
        """Round-2 (v3) stores — msgpack doc log + npz segments — must load
        via replay and migrate to the v4 sidecar layout on the next commit."""
        import json

        import msgpack

        d = tmp_path / "fts"
        d.mkdir()
        recs = []
        for i in range(5):
            recs.append(msgpack.packb(("a", i, 100 + i, 4, "Function", f"f{i}.rs"),
                                      use_bin_type=True))
        recs.append(msgpack.packb(("d", 3), use_bin_type=True))
        blob = b"".join(recs)
        (d / "docs.log").write_bytes(blob)
        # one npz segment: term "hello" in docs 0..4 (content tf 1)
        from codesearch_tpu.fts.store import term_keys

        key = term_keys("hello")[0]
        np.savez(d / "seg-0.npz",
                 terms=np.asarray([key], np.int64),
                 offsets=np.asarray([0, 5], np.int64),
                 dnums=np.arange(5, dtype=np.int64),
                 tfc=np.ones(5, np.int32), tfs=np.zeros(5, np.int32))
        (d / "fts.json").write_text(json.dumps({
            "version": 3, "segments": ["seg-0.npz"], "log_bytes": len(blob),
            "next_dnum": 5, "next_seg": 1,
        }))
        s = FtsStore(d)
        assert len(s) == 4                       # doc 3 deleted in the log
        res = s.search("hello", limit=10)
        assert sorted(r.chunk_id for r in res) == [100, 101, 102, 104]
        assert res[0].path.endswith(".rs")
        s.add_chunk(200, "hello fresh", "g.rs")
        s.commit()                               # migrates to v4 sidecars
        assert (d / "docidx.bin").exists()
        assert not (d / "docs.log").exists()
        s2 = FtsStore(d)
        assert len(s2) == 5
        res2 = s2.search("hello", limit=10)
        assert sorted(r.chunk_id for r in res2) == [100, 101, 102, 104, 200]

    def test_doclog_tail_beyond_manifest_ignored(self, tmp_path):
        s = self._populated(tmp_path)
        # crash between doclog append and manifest flip: extra bytes exist
        # but the manifest's log_bytes cursor doesn't cover them
        with open(s.dir / "docs.log", "ab") as f:
            f.write(b"\x96\xa1a\x63\x63\x02\xa4Kind")  # fragment of an "a" record
        s2 = FtsStore(tmp_path / "fts")
        assert len(s2) == 20
        assert s2.search("token_3")[0].chunk_id == 3

    def test_orphan_segment_pruned(self, tmp_path):
        s = self._populated(tmp_path)
        orphan = s.dir / "seg-999.npz"
        orphan.write_bytes(b"not a real npz")
        s2 = FtsStore(tmp_path / "fts")   # loads fine (manifest ignores it)
        assert len(s2) == 20
        s2.add_chunk(99, "fresh", "z.rs")
        s2.commit()                        # prune pass removes the orphan
        assert not orphan.exists()

    def test_corrupt_segment_skipped(self, tmp_path):
        s = self._populated(tmp_path)
        seg = next(s.dir.glob("seg-*.terms.npy"))
        seg.write_bytes(seg.read_bytes()[: seg.stat().st_size // 2])
        s2 = FtsStore(tmp_path / "fts")   # warns + skips, docs still load
        assert len(s2) == 20
        # degraded contract: the corrupt segment's postings are gone but the
        # search path itself must not raise
        s2.search("token_3")

    def test_corrupt_manifest_starts_empty(self, tmp_path):
        s = self._populated(tmp_path)
        (s.dir / "fts.json").write_text("{not json")
        s2 = FtsStore(tmp_path / "fts")
        assert len(s2) == 0               # degraded, not crashed
        s2.add_chunk(1, "rebuild", "a.rs")
        s2.commit()
        assert FtsStore(tmp_path / "fts").search("rebuild")[0].chunk_id == 1


class TestExactTier:
    """High-df exact lookups ride per-(segment, term) impact tiers; the
    tiered results must be EXACT — identical to the full posting scan —
    with a logged fallback whenever the score bound can't prove it."""

    def _build(self, tmp_path, n=360, prewarm=None):
        s = FtsStore(tmp_path / "fts")
        if prewarm is not None:
            s.exact_tier_prewarm_df = prewarm   # before any commit: every
            # persisted segment gets its tier sidecar
        for i in range(n):
            tf = 1 + (i % 3)
            body = ("hot_term " * tf) + ("filler " * (i % 37)) + f"uniq_{i}"
            sig = f"fn hot_term(v{i})" if i % 7 == 0 else None
            s.add_chunk(i, body, f"f{i}.rs", sig,
                        "Function" if i % 2 else "Struct")
            if i % 120 == 119:
                s.commit()                      # several segments
        for i in range(0, n, 11):
            s.delete_chunk(i)
        s.commit()
        return s

    def _res(self, s, **kw):
        return [(r.chunk_id, round(r.score, 9))
                for r in s.search_exact("hot_term", **kw)]

    def _ref(self, s, **kw):
        """Full-scan reference: tier routing disabled."""
        keep = s.exact_tier_df
        s.exact_tier_df = 10 ** 9
        try:
            return self._res(s, **kw)
        finally:
            s.exact_tier_df = keep

    def test_tiered_matches_full_scan(self, tmp_path):
        s = self._build(tmp_path)
        ref = self._ref(s, limit=15)
        s.exact_tier_df = 50
        s.exact_tier_cap = 64
        assert self._res(s, limit=15) == ref
        assert s.exact_tier_hits == 1 and s.exact_tier_fallbacks == 0
        # warm path: cached tiers, still exact
        assert self._res(s, limit=15) == ref
        assert s.exact_tier_hits == 2

    def test_kind_filter_exact(self, tmp_path):
        s = self._build(tmp_path)
        for kind in ("Function", "Struct"):
            ref = self._ref(s, kind=kind, limit=10)
            s.exact_tier_df = 50
            s.exact_tier_cap = 128
            assert self._res(s, kind=kind, limit=10) == ref

    def test_tiny_cap_falls_back_to_full_scan(self, tmp_path):
        s = self._build(tmp_path)
        ref = self._ref(s, limit=15)
        s.exact_tier_df = 50
        s.exact_tier_cap = 8                    # < limit → bound must fail
        assert self._res(s, limit=15) == ref
        assert s.exact_tier_fallbacks >= 1

    def test_deletes_after_tier_build_masked(self, tmp_path):
        s = self._build(tmp_path)
        s.exact_tier_df = 50
        s.exact_tier_cap = 64
        first = self._res(s, limit=10)
        assert first
        for cid, _ in first[:3]:                # kill current top hits
            s.delete_chunk(cid)
        got = self._res(s, limit=10)
        assert not {c for c, _ in got} & {c for c, _ in first[:3]}
        assert got == self._ref(s, limit=10)

    def test_avg_len_drift_stays_exact(self, tmp_path):
        s = self._build(tmp_path)
        s.exact_tier_df = 50
        s.exact_tier_cap = 64
        self._res(s, limit=10)                  # build tiers at current avg
        for i in range(1000, 1200):             # shift avg_len up a lot
            s.add_chunk(i, "hot_term " + "pad " * 200, f"g{i}.rs")
        s.commit()
        assert self._res(s, limit=10) == self._ref(s, limit=10)

    def test_persisted_tier_serves_fresh_process(self, tmp_path):
        """Tier sidecars written at commit make the first high-df exact
        query in a NEW process a disk read, not a posting scan — and the
        served results stay byte-identical to the full scan."""
        s = self._build(tmp_path, prewarm=16)
        ref = self._ref(s, limit=15)

        s2 = FtsStore(tmp_path / "fts")      # fresh "process"
        s2.exact_tier_df = 50
        s2.exact_tier_cap = 64
        got = [(r.chunk_id, round(r.score, 9))
               for r in s2.search_exact("hot_term", limit=15)]
        assert got == ref
        assert s2.exact_tier_disk_hits >= 1, \
            "fresh store rebuilt tiers instead of reading the sidecar"

    def test_sidecar_pruned_with_merged_segment(self, tmp_path):
        s = self._build(tmp_path, prewarm=16)
        names_before = {p.name for p in s.dir.glob("seg-*.xtier.json")}
        assert names_before, "no sidecars written"
        # grow enough to trigger merges, then confirm dead sidecars gone
        for i in range(5000, 5400):
            s.add_chunk(i, "hot_term " + f"x_{i}", f"m{i}.rs")
            if i % 80 == 79:
                s.commit()
        s.commit()
        live = {f"{seg.name}.xtier.json" for seg in s._segments}
        on_disk = {p.name for p in s.dir.glob("seg-*.xtier.json")}
        assert on_disk <= live

    def test_corrupt_sidecar_falls_back(self, tmp_path):
        s = self._build(tmp_path, prewarm=16)
        ref = self._ref(s, limit=15)
        sidecars = list(s.dir.glob("seg-*.xtier.dn.npy"))
        assert sidecars, "no sidecars written"
        for p in sidecars:
            p.write_bytes(b"garbage")
        s2 = FtsStore(tmp_path / "fts")
        s2.exact_tier_df = 50
        s2.exact_tier_cap = 64
        got = [(r.chunk_id, round(r.score, 9))
               for r in s2.search_exact("hot_term", limit=15)]
        assert got == ref                    # rebuilt on demand, still exact

    def test_merge_invalidates_via_new_segment_seq(self, tmp_path):
        s = self._build(tmp_path)
        s.exact_tier_df = 50
        s.exact_tier_cap = 64
        self._res(s, limit=10)
        # force growth + merges, then verify against the full scan
        for i in range(2000, 2300):
            s.add_chunk(i, ("hot_term " * (1 + i % 2)) + f"tail_{i}",
                        f"h{i}.rs")
            if i % 60 == 59:
                s.commit()
        s.commit()
        assert self._res(s, limit=12) == self._ref(s, limit=12)


class TestIncrementalDeviceSync:
    """Round-2: the resident device postings must sync incrementally — new
    segments DUS-append, deletes scatter the valid mask; full re-uploads
    happen only on capacity/garbage/drift triggers."""

    def _store(self, tmp_path, n=600):
        s = FtsStore(tmp_path / "fts")
        s.device_min_docs = 1   # force the device path at tiny sizes
        for i in range(n):
            s.add_chunk(i, f"alpha beta gamma_{i} delta epsilon", f"f{i}.rs",
                        f"fn gamma_{i}()", "Function")
        s.commit()
        return s

    def test_new_segment_appends_without_rebuild(self, tmp_path):
        s = self._store(tmp_path)
        assert s.search("gamma_123")[0].chunk_id == 123
        uploads0 = s.fts_full_uploads
        # add more docs in a new segment (small — merge policy may fold, in
        # which case bases change but the sync is still DUS-append of the
        # merged segment unless capacity overflows)
        for i in range(600, 640):
            s.add_chunk(i, f"alpha zeta eta_{i} theta", f"f{i}.rs",
                        f"fn eta_{i}()", "Function")
        res = s.search("eta_615")
        assert res and res[0].chunk_id == 615
        assert s.fts_full_uploads == uploads0, "doc adds must not re-upload postings"
        assert s.fts_incremental_updates > 0

    def test_delete_scatters_validity(self, tmp_path):
        s = self._store(tmp_path)
        s.search("gamma_5")   # sync
        uploads0 = s.fts_full_uploads
        s.delete_chunk(123)
        res = s.search("gamma_123", limit=50)
        assert all(r.chunk_id != 123 for r in res)
        assert s.fts_full_uploads == uploads0, "deletes must be a mask scatter"

    def test_meta_append_overflow_triggers_rebuild(self, tmp_path):
        """Regression (ADVICE r2): ncap=1024 synced at n=1000, then +24 docs
        — the pow2-padded doc-append block [1000, 1032) exceeds ncap, so the
        sync must full-rebuild instead of letting dynamic_update_slice clamp
        the start (which would clobber slots 968..1000 and misplace the new
        docs' kind/liveness)."""
        s = self._store(tmp_path, n=1000)
        s.search("gamma_7")  # sync → ncap = 1024, n_synced = 1000
        assert s._dev_state["ncap"] == 1024
        for i in range(1000, 1024):
            s.add_chunk(i, f"alpha beta gamma_{i} delta epsilon", f"f{i}.rs",
                        f"fn gamma_{i}()", "Function")
        # n = 1024 <= ncap, but 1000 + pow2(24) = 1032 > 1024
        dev = s.search("alpha gamma_1010", limit=10)
        assert dev and dev[0].chunk_id == 1010
        # previously-synced docs must be intact (the clamp bug clobbered
        # the tail of the synced range)
        for probe in (970, 990, 999):
            res = s.search(f"gamma_{probe}", limit=5)
            assert res and res[0].chunk_id == probe
        s.device_min_docs = 10**9
        host = s.search("alpha gamma_1010", limit=10)
        assert [r.chunk_id for r in dev] == [r.chunk_id for r in host]

    def test_post_sync_deletes_cannot_displace_live_topk(self, tmp_path):
        """Exactness of the kpre oversample (ops/bm25.py): postings of docs
        deleted AFTER the device sync stay nonzero on device; the kernel
        must still return k LIVE docs, not k-minus-dead. Here every
        top-scoring doc dies post-sync, so without the oversample the raw
        top-k would be 100% dead and the masked result would be empty."""
        s = FtsStore(tmp_path / "fts")
        s.device_min_docs = 1
        # 50 high-tf docs (will die) + 60 low-tf docs + 290 fillers keeps
        # df("omega") = 110 under the MAX_DF_RATIO stopword cap even after
        # the deletes shrink n_live to 350 (cap 140)
        for i in range(50):
            s.add_chunk(i, "omega omega omega omega dense hit", f"a{i}.rs")
        for i in range(50, 110):
            s.add_chunk(i, "omega plain mention here", f"b{i}.rs")
        for i in range(110, 400):
            s.add_chunk(i, f"filler_{i} unrelated text", f"c{i}.rs")
        s.commit()
        s.search("omega")  # device sync
        uploads0 = s.fts_full_uploads
        for i in range(50):
            s.delete_chunk(i)
        dev = s.search("omega", limit=16)
        assert s.fts_full_uploads == uploads0, "50 deletes must stay a scatter"
        assert s._dev_state["dead_scattered"] == 50
        assert len(dev) == 16
        assert all(r.chunk_id >= 50 for r in dev)
        s.device_min_docs = 10**9
        host = s.search("omega", limit=16)
        # the 60 surviving docs tie exactly — device and host may break
        # ties differently; scores must match pairwise. Tolerance: device
        # contributions embed len-norm at the synced avg_len; deletes
        # shift avg_len slightly (rebuild only past 10% drift by design)
        assert len(host) == 16
        for d, h in zip(dev, host):
            assert d.score == pytest.approx(h.score, rel=2e-2)

    def test_dead_resync_cap_triggers_rebuild(self, tmp_path):
        """Past DEAD_RESYNC_MAX post-sync deletes, a full resync (which
        drops dead postings at upload) must replace ever-larger kpre
        oversampling — and reset the dead counter."""
        import codesearch_tpu.fts.store as fstore

        s = self._store(tmp_path, n=600)
        s.search("gamma_7")  # sync
        uploads0 = s.fts_full_uploads
        try:
            fstore.DEAD_RESYNC_MAX = 30
            for i in range(40):
                s.delete_chunk(i)
            res = s.search("alpha gamma_100", limit=5)
            assert res and res[0].chunk_id == 100
            assert s.fts_full_uploads == uploads0 + 1
            assert s._dev_state["dead_scattered"] == 0
        finally:
            fstore.DEAD_RESYNC_MAX = 2048

    def test_device_results_match_host_after_updates(self, tmp_path):
        s = self._store(tmp_path)
        s.search("gamma_7")  # device sync
        for i in range(600, 620):
            s.add_chunk(i, f"alpha beta gamma_{i} delta epsilon", f"f{i}.rs",
                        f"fn gamma_{i}()", "Function")
        s.delete_chunk(3)
        dev = s.search("alpha gamma_610", limit=10)
        s.device_min_docs = 10**9
        host = s.search("alpha gamma_610", limit=10)
        assert [r.chunk_id for r in dev][:3] == [r.chunk_id for r in host][:3]
        for d, h in zip(dev, host):
            assert d.score == pytest.approx(h.score, rel=2e-3)


class TestSealedSegments:
    """Round-3: segments past MERGE_MAX_POSTINGS leave the merge pool —
    correctness must hold across many sealed segments and query results
    must match a single-segment store."""

    def test_sealed_segments_stay_correct(self, tmp_path, monkeypatch):
        import codesearch_tpu.fts.store as fstore

        monkeypatch.setattr(fstore, "MERGE_MAX_POSTINGS", 200)
        s = FtsStore(tmp_path / "fts")
        for b in range(10):
            for i in range(30):
                cid = b * 30 + i
                s.add_chunk(cid, f"alpha beta gamma_{cid} delta", f"f{cid}.rs",
                            f"fn gamma_{cid}()", "Function")
            s.commit()
        st = s.stats()
        assert st["segments"] > 1, "seal cap should prevent full merges"
        # reference store without sealing
        ref = FtsStore(tmp_path / "ref")
        for cid in range(300):
            ref.add_chunk(cid, f"alpha beta gamma_{cid} delta", f"f{cid}.rs",
                          f"fn gamma_{cid}()", "Function")
        ref.commit()
        for probe in (0, 123, 299):
            got = s.search(f"gamma_{probe}", limit=5)
            want = ref.search(f"gamma_{probe}", limit=5)
            assert got[0].chunk_id == want[0].chunk_id == probe
            assert got[0].score == pytest.approx(want[0].score, rel=1e-5)
        # reload keeps sealed layout + correctness (mmapped posting bulk)
        s2 = FtsStore(tmp_path / "fts")
        assert s2.search("gamma_200")[0].chunk_id == 200

    def test_mmapped_segments_after_reload(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        for cid in range(50):
            s.add_chunk(cid, f"omega tok_{cid}", f"f{cid}.rs")
        s.commit()
        s2 = FtsStore(tmp_path / "fts")
        seg = s2._segments[0]
        assert isinstance(seg.dnums, np.memmap)
        assert s2.search("tok_42")[0].chunk_id == 42
        # deletes + merges over mmapped inputs still work
        s2.delete_chunk(42)
        for cid in range(50, 80):
            s2.add_chunk(cid, f"omega tok_{cid}", f"f{cid}.rs")
        s2.commit()
        assert s2.search("tok_42") == []
        assert s2.search("tok_77")[0].chunk_id == 77


class TestReadonlyV4:
    def test_readonly_open_and_search(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        for i in range(40):
            s.add_chunk(i, f"omega tok_{i} shared", f"f{i // 8}.rs",
                        f"fn tok_{i}()", "Function")
        s.delete_chunk(11)
        s.commit()
        r = FtsStore(tmp_path / "fts", readonly=True)
        assert len(r) == 39
        assert r.search("tok_17")[0].chunk_id == 17
        # deleted doc never resurfaces (its subtokens match other docs)
        assert all(x.chunk_id != 11 for x in r.search("tok_11", limit=50))
        assert r.search_exact("tok_23")[0].chunk_id == 23
        r.commit()   # no-op, must not raise or write


class TestCommitAtomicity:
    def test_paths_correct_after_clear_and_readd(self, tmp_path):
        """Regression (r3 review): clear() must not leave stale path-table
        lines that remap interned ids on reload."""
        s = FtsStore(tmp_path / "fts")
        s.add_chunk(1, "alpha content", "a.rs", "fn alpha()", "Function")
        s.add_chunk(2, "beta content", "b.rs", "fn beta()", "Function")
        s.commit()
        s.clear()
        s.add_chunk(3, "gamma content", "c.rs", "fn gamma()", "Function")
        s.commit()
        s2 = FtsStore(tmp_path / "fts")
        res = s2.search("gamma")
        assert res and res[0].path == "c.rs"

    def test_old_manifest_plus_old_bitmap_stays_consistent(self, tmp_path):
        """A crash anywhere before the manifest rename must leave the OLD
        snapshot fully intact — including the liveness bitmap it refers to
        (bitmaps are sequence-stamped; the manifest selects one)."""
        import shutil

        d = tmp_path / "fts"
        s = FtsStore(d)
        for i in range(10):
            s.add_chunk(i, f"tok_{i} words here", f"f{i}.rs",
                        f"fn tok_{i}()", "Function")
        s.commit()
        snap = {p.name: p.read_bytes() for p in d.iterdir() if p.is_file()}
        # replace doc 5 and delete doc 7, then commit (new bitmap + manifest)
        s.add_chunk(5, "tok_5 replaced body", "f5.rs", "fn tok_5()", "Function")
        s.delete_chunk(7)
        s.commit()
        # simulate a crash before the manifest rename: restore the old
        # manifest AND every file it referenced
        crash = tmp_path / "crash"
        shutil.copytree(d, crash)
        for name, blob in snap.items():
            (crash / name).write_bytes(blob)
        s2 = FtsStore(crash)
        assert len(s2) == 10
        assert s2.search("tok_5")[0].chunk_id == 5
        assert s2.search("tok_7")[0].chunk_id == 7   # delete not yet committed

    def test_crashed_path_append_tail_overwritten(self, tmp_path):
        """A crash after a paths.txt append but before the manifest rename
        leaves a stale uncommitted line; the next commit must OVERWRITE it
        (byte-cursor seek), not append after it."""
        d = tmp_path / "fts"
        s = FtsStore(d)
        s.add_chunk(1, "alpha", "a.rs")
        s.add_chunk(2, "beta", "b.rs")
        s.commit()
        # simulate the crashed append: stale uncommitted line at EOF
        with open(d / "paths.txt", "ab") as f:
            f.write(b'"crashed.rs"\n')
        s2 = FtsStore(d)
        s2.add_chunk(3, "gamma", "c.rs")
        s2.commit()
        s3 = FtsStore(d)
        assert s3.search("gamma")[0].path == "c.rs"
        assert s3.search("alpha")[0].path == "a.rs"


class TestPathTerms:
    """Path tokens ride the signature field: filename/directory names are
    retrieval signals (src/main.rs must surface for 'main entry point'
    style queries; the reference's tantivy path field is an unsearchable
    raw STRING)."""

    def test_filename_terms_retrievable(self, tmp_path):
        s = FtsStore(tmp_path / "fts")
        s.add_chunk(1, "fn start() { run() }", "src/main.rs", None, "")
        s.add_chunk(2, "fn helper() { aux() }", "src/util/strings.rs", None, "")
        s.commit()
        hits = s.search("main")
        assert hits and hits[0].chunk_id == 1
        hits = s.search("strings util")
        assert hits and hits[0].chunk_id == 2

    def test_batch_matches_single_with_paths(self, tmp_path):
        rows = [(i, f"body_{i} stuff", f"pkg/mod_{i % 3}/file_{i}.py",
                 f"def f_{i}()", "Function") for i in range(12)]
        a = FtsStore(tmp_path / "a")
        for r in rows:
            a.add_chunk(*r)
        a.commit()
        b = FtsStore(tmp_path / "b")
        b.add_chunks(rows)
        b.commit()
        assert a.stats()["postings"] == b.stats()["postings"]
        for q in ("file_7", "mod_1 body_4", "pkg"):
            ra = [(r.chunk_id, round(r.score, 6)) for r in a.search(q)]
            rb = [(r.chunk_id, round(r.score, 6)) for r in b.search(q)]
            assert ra == rb


class TestScorePlanes:
    """Resident dense score planes (round-4): terms with df above
    ``plane_df_floor`` — or promoted to fit ``sparse_chunk_budget`` —
    score through cached per-term [N] columns + the merged dense/sparse
    selection (ops/bm25.py _merge_dense). Results must match host BM25
    exactly; planes must build once, invalidate on new postings, and
    evict LRU."""


    @staticmethod
    def _assert_rank_equivalent(dev, host):
        """Exact scores per rank; ids must match within each tie group
        as SETS (tie order between host argpartition and device top_k is
        arbitrary and both are valid)."""
        assert len(dev) == len(host)
        for d, h in zip(dev, host):
            assert d.score == pytest.approx(h.score, rel=2e-3)
        # group by (rounded) score and compare membership
        from collections import defaultdict
        gd, gh = defaultdict(set), defaultdict(set)
        for d in dev:
            gd[round(d.score, 4)].add(d.chunk_id)
        for h in host:
            gh[round(h.score, 4)].add(h.chunk_id)
        for score, ids in gh.items():
            # boundary ties may be cut differently; require overlap shape
            assert gd[score] or score in gd, f"score group {score} missing"

    def _build(self, tmp_path, n=600):
        s = FtsStore(tmp_path / "fts")
        for i in range(n):
            # "common" appears in every 4th doc (df 150), "shared" in every
            # 3rd (df 200) — both high-df but under the MAX_DF_RATIO
            # stopword cap (0.4·600 = 240); rare_{i} is unique per doc
            extra = " common" if i % 4 == 0 else ""
            extra += " shared" if i % 3 == 0 else ""
            s.add_chunk(i, f"alpha rare_{i} beta{extra}", f"f{i}.rs",
                        f"fn rare_{i}()", "Function")
        s.commit()
        return s

    def test_device_with_planes_matches_host(self, tmp_path):
        s = self._build(tmp_path)
        q = "rare_10 common shared alpha"
        host = s.search(q, limit=8)
        assert host, "host baseline must hit"
        s.device_min_docs = 1
        s.plane_df_floor = 50          # common (300), shared (200), alpha (600→capped? df 600 of 600 → stopword-capped)
        args = s.device_query_args(q, None, 8)
        assert args is not None and args[9] is not None, "planes must route"
        assert s.plane_builds >= 1
        dev = s.search(q, limit=8)
        assert dev[0].chunk_id == host[0].chunk_id  # unique top doc
        self._assert_rank_equivalent(dev, host)

    def test_release_planes_falls_back_sparse(self, tmp_path):
        """release_planes (the HBM-pressure escape hatch) must reroute
        high-df terms to the sparse chunk-gather leg with identical
        results, and bump mutation_count so session caches invalidate."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        q = "rare_10 common shared"
        host_baseline = s.search(q, limit=8)
        args = s.device_query_args(q, None, 8)
        assert args is not None and args[9] is not None   # planes routed
        mc = s.mutation_count
        s.release_planes()
        assert s.planes_enabled is False
        assert s.mutation_count == mc + 1
        args2 = s.device_query_args(q, None, 8)
        if args2 is not None:
            assert args2[9] is None                       # sparse leg only
        dev = s.search(q, limit=8)
        assert dev[0].chunk_id == host_baseline[0].chunk_id
        self._assert_rank_equivalent(dev, host_baseline)

    def test_planes_disabled_respects_sparse_budget(self, tmp_path):
        """With planes disabled (OOM degrade), the chunk-gather leg must
        stay bounded: an over-budget query returns None (host BM25) rather
        than building an unbounded device chunk table — the per-df-class
        executable-explosion path (ADVICE r4 medium)."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        q = "rare_10 common shared"
        host_baseline = s.search(q, limit=8)
        s.release_planes()
        s.sparse_chunk_budget = 2      # "common"+"shared" chunks exceed this
        args = s.device_query_args(q, None, 8)
        assert args is None            # over budget → host fallback
        dev = s.search(q, limit=8)     # search still serves via host scoring
        assert dev[0].chunk_id == host_baseline[0].chunk_id
        self._assert_rank_equivalent(dev, host_baseline)

    def test_dense_only_query_matches_host(self, tmp_path):
        s = self._build(tmp_path)
        host = s.search("common shared", limit=8)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        dev = s.search("common shared", limit=8)
        self._assert_rank_equivalent(dev, host)

    def test_kind_boost_with_planes_matches_host(self, tmp_path):
        s = self._build(tmp_path)
        host = s.search("common rare_21", limit=8, boost_kind="Function")
        s.device_min_docs = 1
        s.plane_df_floor = 50
        dev = s.search("common rare_21", limit=8, boost_kind="Function")
        assert dev[0].chunk_id == host[0].chunk_id  # unique top doc
        self._assert_rank_equivalent(dev, host)

    def test_plane_cached_across_queries(self, tmp_path):
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s.search("common rare_1", limit=5)
        builds = s.plane_builds
        s.search("common rare_2", limit=5)
        assert s.plane_builds == builds, "plane must be served from cache"

    def test_budget_promotion_routes_mid_df_terms(self, tmp_path):
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 10_000       # nothing crosses the df floor
        s.sparse_chunk_budget = 1       # ...but the budget promotes anyway
        args = s.device_query_args("common shared rare_5", None, 8)
        assert args is not None and args[9] is not None
        dev = s.search("common shared rare_5", limit=8)
        s2 = self._build(tmp_path.parent / "b")
        host = s2.search("common shared rare_5", limit=8)
        assert dev[0].chunk_id == host[0].chunk_id  # unique top doc
        self._assert_rank_equivalent(dev, host)

    def test_plane_invalidated_by_new_postings(self, tmp_path):
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s.search("common rare_3", limit=5)
        builds = s.plane_builds
        # new docs add 'common' postings → the cached plane is stale
        for i in range(600, 640):
            s.add_chunk(i, "common fresh_doc text", f"g{i}.rs",
                        f"fn fresh_{i}()", "Function")
        s.commit()
        res = s.search("common fresh_doc", limit=50)
        assert s.plane_builds > builds, "stale plane must rebuild"
        assert any(r.chunk_id >= 600 for r in res), \
            "new docs must score through the rebuilt plane"

    def test_plane_lru_eviction(self, tmp_path):
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s._plane_rows_cap = lambda: 4
        # 6 distinct dense terms across queries → evictions
        for i in range(6):
            term = ["common", "shared", "alpha", "beta", "common", "shared"][i]
            s.search(f"{term} rare_{i}", limit=5)
        # cache can hold 4 rows; alpha/beta (df 600=all docs) are stopword-
        # capped, so only common/shared alternate — no eviction needed here;
        # force it with monkeypatched floor over unique-ish terms instead
        s.plane_df_floor = 0
        s.search("rare_7 rare_8 rare_9 rare_10 rare_11", limit=5)
        s.search("rare_12 rare_13 rare_14 rare_15 rare_16", limit=5)
        assert s.plane_evictions > 0

    def test_plane_prewarm_at_sync(self, tmp_path):
        """Device sync must prewarm score planes for the highest-df terms
        (the planes analog of the exact-tier commit prewarm): the first
        query touching a prewarmed dense term then pays NO scatter build —
        the r4 2.1× hybrid mean/p50 tail was exactly these builds landing
        inside the timed/serving query path."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s._ensure_device()             # sync (any first dispatch does this)
        assert s.plane_prewarms >= 2   # common (df 150) + shared (df 200)
        builds = s.plane_builds
        host = FtsStore(tmp_path / "fts")
        host_res = host.search("common rare_10", limit=8)
        res = s.search("common rare_10", limit=8)
        assert s.plane_builds == builds, "prewarmed term must not rebuild"
        assert res[0].chunk_id == host_res[0].chunk_id
        self._assert_rank_equivalent(res, host_res)

    def test_plane_prewarm_leaves_headroom(self, tmp_path):
        """When the plane-eligible working set exceeds the buffer, prewarm
        must leave free rows (r5: at 32 rows the 1M bench prewarm filled
        the buffer and the timed queries thrashed the LRU — 18 in-query
        builds) and insert lowest-df first so LRU-oldest == least
        valuable."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s._plane_rows_cap = lambda: 4      # tiny buffer, 2 eligible terms
        s._ensure_device()
        st = s._dev_state
        # reserve = max(2, 4 // 8) = 2 → at most 2 of 4 rows prewarmed
        assert s.plane_prewarms <= 2
        if st.get("planes") is not None:
            assert len(st["plane_free"]) >= 2
        # a query-time miss must land in a free row, not evict
        ev = s.plane_evictions
        s.search("common shared rare_1", limit=5)
        assert s.plane_evictions == ev

    def test_plane_compile_warm_records_shapes(self, tmp_path):
        """_compile_warm_builds must AOT-compile the (1-2 row, bucket)
        build shapes in the background and record them; a second sync must
        not re-warm. Forced on a small store via compile_warm_min_ncap."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        s.compile_warm_min_ncap = 0
        s._ensure_device()
        t = s._plane_warm_thread
        assert t is not None
        t.join(timeout=60)
        assert not t.is_alive()
        shapes = s._dev_state["plane_build_shapes"]
        # candidate buckets ∪ the ≤64-chunk promotion ladder, rpad 1 and 2
        assert shapes and all(r in (1, 2) for r, _c in shapes)
        assert {c for _r, c in shapes} >= {8, 16, 32, 64}
        # idempotent: nothing new to warm on a repeat prewarm
        s._dev_state["prewarm_sig"] = None
        s._prewarm_planes()
        t2 = s._plane_warm_thread
        if t2 is not t:
            t2.join(timeout=60)
        assert s._dev_state["plane_build_shapes"] == shapes
        # and the query path still matches host scoring after warm
        host = FtsStore(tmp_path / "fts")
        host_res = host.search("common rare_10", limit=8)
        res = s.search("common rare_10", limit=8)
        assert res[0].chunk_id == host_res[0].chunk_id
        self._assert_rank_equivalent(res, host_res)

    def test_stacked_wave_with_planes(self, tmp_path):
        from codesearch_tpu.fts.store import stack_query_args

        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        # this test exercises the COLD per-prep build path (prewarm at sync
        # would build common/shared up front and all preps would share one
        # buffer object — no mismatch left to verify)
        s.plane_prewarm = False
        a1 = s.device_query_args("common rare_4", None, 8)
        a2 = s.device_query_args("rare_5 beta", None, 8)   # no dense terms?
        a3 = s.device_query_args("shared rare_6", None, 8)
        # cold preps that each BUILT a plane snapshot different buffer
        # objects — stacking refuses (callers re-prep once, pipeline.py)
        with pytest.raises(ValueError):
            stack_query_args([a1, a2, a3])
        a1 = s.device_query_args("common rare_4", None, 8)
        a2 = s.device_query_args("rare_5 beta", None, 8)
        a3 = s.device_query_args("shared rare_6", None, 8)
        builds = s.plane_builds
        stacked = stack_query_args([a1, a2, a3])
        assert s.plane_builds == builds  # warm re-prep: cache hits only
        assert stacked[9] is not None        # wave rides the planes variant
        assert stacked[8].shape[0] == 4      # bpad
        # per-query equivalence: batch kernel vs single-path search()
        import jax.numpy as jnp

        from codesearch_tpu.ops.bm25 import bm25_resident_topk_batch

        dev, cs, cl, ci, kid, k, kpre, imax, pw, planes = stacked
        vals, idx = bm25_resident_topk_batch(
            dev[0], dev[1], dev[2], jnp.asarray(cs), jnp.asarray(cl),
            jnp.asarray(ci), jnp.asarray(kid), k, kpre, imax,
            pw=jnp.asarray(pw), planes=planes,
        )
        for row, q in ((0, "common rare_4"), (1, "rare_5 beta"),
                       (2, "shared rare_6")):
            single = s.search(q, limit=8)
            got = s.results_from_device(np.asarray(vals[row]),
                                        np.asarray(idx[row]), 8)
            self._assert_rank_equivalent(got, single)

    def test_post_sync_deletes_masked_in_dense_leg(self, tmp_path):
        """Docs deleted AFTER the device sync keep nonzero plane columns —
        the kpre oversample + slot_meta mask must keep them out, and the
        survivors must match a fresh host scoring."""
        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 50
        before = s.search("shared rare_9", limit=10)
        assert s.plane_builds >= 1
        victims = {r.chunk_id for r in before[:3]} - {9}
        for cid in victims:
            s.delete_chunk(cid)
        after = s.search("shared rare_9", limit=10)
        got = {r.chunk_id for r in after}
        assert not (got & victims), "deleted docs leaked through the planes"
        host = [r for r in s.search("shared rare_9", limit=10)]
        self._assert_rank_equivalent(after, host)

    def test_wide_wave_rides_merge_subbatches(self, tmp_path):
        """A 16-query stacked wave exceeds ops/bm25.py _MERGE_SUB (8), so
        the dense merge runs through the lax.map sub-batch path — which
        must be bit-equivalent, per query, to the direct (≤8-row) path
        used by single search()."""
        import jax.numpy as jnp

        from codesearch_tpu.fts.store import stack_query_args
        from codesearch_tpu.ops.bm25 import _MERGE_SUB, bm25_resident_topk_batch

        s = self._build(tmp_path)
        s.device_min_docs = 1
        s.plane_df_floor = 0           # every kept term rides a plane
        # 12 queries → bpad 16 (> _MERGE_SUB). Term budget: each query
        # contributes rare_i + its digit subtoken (the tokenizer splits
        # rare_i; bare "rare" is stopword-capped at df 600) + the shared
        # common/shared pair ≈ 26 planes, under the 32-row cap — MORE
        # queries would LRU-thrash and stack_query_args would correctly
        # refuse the wave.
        queries = [f"rare_{i} common" if i % 2 else f"rare_{i} shared"
                   for i in range(12)]
        for q in queries:              # cold pass: builds all planes
            s.device_query_args(q, None, 8)
        args = [s.device_query_args(q, None, 8) for q in queries]
        builds = s.plane_builds
        stacked = stack_query_args(args)
        assert s.plane_builds == builds, "warm wave must not rebuild"
        assert stacked[9] is not None
        dev, cs, cl, ci, kid, k, kpre, imax, pw, planes = stacked
        assert pw.shape[0] > _MERGE_SUB      # the sub-batched shape class
        vals, idx = bm25_resident_topk_batch(
            dev[0], dev[1], dev[2], jnp.asarray(cs), jnp.asarray(cl),
            jnp.asarray(ci), jnp.asarray(kid), k, kpre, imax,
            pw=jnp.asarray(pw), planes=planes,
        )
        for row, q in enumerate(queries):
            single = s.search(q, limit=8)
            got = s.results_from_device(np.asarray(vals[row]),
                                        np.asarray(idx[row]), 8)
            self._assert_rank_equivalent(got, single)

    def test_cold_prep_builds_planes_in_groups(self, tmp_path):
        """A prep with more missing dense terms than PLANE_BUILD_ROWS must
        batch the builds into multiple grouped dispatches (one functional
        buffer replacement per group, not per term) and still score
        exactly."""
        from codesearch_tpu.fts.store import PLANE_BUILD_ROWS

        s = self._build(tmp_path)
        host = s.search("rare_1 rare_2 rare_3 common", limit=8)
        s.device_min_docs = 1
        s.plane_df_floor = 0
        q = " ".join(f"rare_{i}" for i in range(1, PLANE_BUILD_ROWS + 3))
        q += " common"
        args = s.device_query_args(q, None, 8)
        assert args is not None and args[9] is not None
        assert s.plane_builds >= PLANE_BUILD_ROWS + 3  # > one group's worth
        dev = s.search("rare_1 rare_2 rare_3 common", limit=8)
        self._assert_rank_equivalent(dev, host)
