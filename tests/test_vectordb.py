"""Vector store tests: tempdir-isolated against the real device path with
tiny hand-made embeddings — mirroring the reference's store tests
(vectordb/store.rs:833-1028): insert/search ordering, replace, delete,
reopen persistence, stats, clear."""

import numpy as np
import pytest

from codesearch_tpu.vectordb import ChunkMetadata, VectorStore
from codesearch_tpu.utils.errors import DatabaseError


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _meta(path="a.rs", content="fn a() {}", kind="Function", **kw):
    return ChunkMetadata(
        path=path, content=content, start_line=0, end_line=1, kind=kind, **kw
    )


@pytest.fixture()
def store(tmp_path):
    return VectorStore(tmp_path / "db", dims=4)


def _embs(*rows):
    return _norm(np.asarray(rows, np.float32))


class TestInsertSearch:
    def test_search_ordering(self, store):
        embs = _embs([1, 0, 0, 0], [0, 1, 0, 0], [0.9, 0.1, 0, 0])
        ids = store.insert_chunks_with_ids(embs, [_meta(content=f"c{i}") for i in range(3)])
        assert ids == [0, 1, 2]
        q = _norm(np.asarray([1.0, 0, 0, 0], np.float32))
        res = store.search(q, limit=3)
        assert [r.chunk_id for r in res] == [0, 2, 1]
        assert res[0].score == pytest.approx(1.0, abs=1e-2)
        assert res[0].metadata.content == "c0"

    def test_replace_same_id(self, store):
        store.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta(content="old")], ids=[7])
        store.insert_chunks_with_ids(_embs([0, 1, 0, 0]), [_meta(content="new")], ids=[7])
        assert len(store) == 1
        res = store.search(_norm(np.asarray([0, 1, 0, 0], np.float32)), 1)
        assert res[0].chunk_id == 7
        assert res[0].metadata.content == "new"

    def test_next_id_advances(self, store):
        store.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta()], ids=[10])
        ids = store.insert_chunks_with_ids(_embs([0, 1, 0, 0]), [_meta()])
        assert ids == [11]

    def test_dims_mismatch(self, store):
        with pytest.raises(DatabaseError):
            store.insert_chunks_with_ids(np.zeros((1, 8), np.float32), [_meta()])

    def test_empty_store_search(self, store):
        assert store.search(np.zeros(4, np.float32), 5) == []


class TestDelete:
    def test_delete_removes_from_results(self, store):
        embs = _embs([1, 0, 0, 0], [0, 1, 0, 0])
        store.insert_chunks_with_ids(embs, [_meta(content="a"), _meta(content="b")])
        assert store.delete_chunks([0]) == 1
        res = store.search(_norm(np.asarray([1, 0, 0, 0], np.float32)), 5)
        assert all(r.chunk_id != 0 for r in res)
        assert len(store) == 1

    def test_get_chunks_by_file(self, store):
        store.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]),
            [_meta(path="x.rs"), _meta(path="y.rs"), _meta(path="x.rs")],
        )
        assert sorted(store.get_chunks_by_file("x.rs")) == [0, 2]


class TestPersistence:
    def test_reopen(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0, 1, 0, 0]),
            [_meta(content="first"), _meta(content="second")],
        )
        s.save()
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 2
        res = s2.search(_norm(np.asarray([0, 1, 0, 0], np.float32)), 1)
        assert res[0].metadata.content == "second"
        assert s2.next_id() == 2

    def test_save_compacts_tombstones(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0]),
            [_meta(), _meta(), _meta()],
        )
        s.delete_chunks([1])
        s.save()
        assert s.stats().tombstones == 0
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 2
        assert s2.get_chunk(1) is None
        assert s2.get_chunk(0) is not None

    def test_readonly(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta()])
        s.save()
        r = VectorStore(tmp_path / "db", dims=4, readonly=True)
        assert len(r) == 1
        with pytest.raises(DatabaseError):
            r.insert_chunks_with_ids(_embs([0, 1, 0, 0]), [_meta()])

    def test_readonly_missing_db(self, tmp_path):
        with pytest.raises(DatabaseError):
            VectorStore(tmp_path / "nope", dims=4, readonly=True)

    def test_dims_mismatch_on_open(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta()])
        s.save()
        with pytest.raises(DatabaseError):
            VectorStore(tmp_path / "db", dims=8)

    def test_clear(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta()])
        s.clear()
        assert len(s) == 0
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 0


class TestBatchAndStats:
    def test_batched_multi_query(self, store):
        embs = _embs([1, 0, 0, 0], [0, 1, 0, 0])
        store.insert_chunks_with_ids(embs, [_meta(content="a"), _meta(content="b")])
        qs = _norm(np.asarray([[1, 0, 0, 0], [0, 1, 0, 0]], np.float32))
        res = store.search_batch(qs, 1)
        assert res[0][0].metadata.content == "a"
        assert res[1][0].metadata.content == "b"

    def test_stats(self, store):
        store.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta()])
        st = store.stats()
        assert st.chunk_count == 1
        assert st.dims == 4

    def test_int8_store(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4, int8=True)
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0.9, 0.1, 0, 0], [0, 1, 0, 0]),
            [_meta(content=f"c{i}") for i in range(3)],
        )
        res = s.search(_norm(np.asarray([1, 0, 0, 0], np.float32)), 2)
        assert res[0].metadata.content == "c0"


class TestIncrementalPersistence:
    """VERDICT round-1 item 1: editing one file in a large index must move
    O(file) bytes on disk and device — no full-matrix rewrite/re-upload."""

    def test_save_appends_not_rewrites(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _norm(np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)),
            [_meta(content=f"c{i}") for i in range(100)],
        )
        s.save()
        ep = s._embed_path(s._generation)
        lp = s._log_path(s._generation)
        size0, log0, gen0 = ep.stat().st_size, lp.stat().st_size, s._generation
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0, 1, 0, 0]), [_meta(content="x"), _meta(content="y")]
        )
        s.save()
        assert s._generation == gen0, "no compaction should have run"
        assert ep.stat().st_size == size0 + 2 * 4 * 2, "exactly 2 fp16 rows appended"
        assert lp.stat().st_size > log0
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 102

    def test_delete_is_o_change_until_ratio(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _norm(np.random.default_rng(0).normal(size=(100, 4)).astype(np.float32)),
            [_meta(content=f"c{i}") for i in range(100)],
        )
        s.save()
        gen0 = s._generation
        ep_size0 = s._embed_path(gen0).stat().st_size
        s.delete_chunks([0, 1])  # 2% tombstones — below compact ratio
        s.save()
        assert s._generation == gen0
        assert s._embed_path(gen0).stat().st_size == ep_size0  # rows stay; log records the dels
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 98
        assert s2.get_chunk(0) is None
        # crossing the ratio compacts into a new generation
        s.delete_chunks(list(range(2, 40)))
        s.save()
        assert s._generation == gen0 + 1
        assert s.stats().tombstones == 0
        assert not s._embed_path(gen0).exists(), "stale generation removed"

    def test_device_update_is_incremental(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _norm(np.random.default_rng(1).normal(size=(64, 4)).astype(np.float32)),
            [_meta(content=f"c{i}") for i in range(64)],
        )
        q = _norm(np.asarray([1.0, 0, 0, 0], np.float32))
        s.search(q, 5)
        assert s.full_uploads == 1
        # the "watcher edits one file" path: delete + insert + search
        s.delete_chunks([3])
        s.insert_chunks_with_ids(_embs([1, 0, 0, 0]), [_meta(content="edited")], ids=[3])
        res = s.search(q, 5)
        assert s.full_uploads == 1, "no full HBM re-upload on an incremental edit"
        assert s.incremental_updates >= 1
        assert res[0].chunk_id == 3
        assert res[0].metadata.content == "edited"

    def test_device_update_is_incremental_int8(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4, int8=True)
        s.insert_chunks_with_ids(
            _norm(np.random.default_rng(2).normal(size=(32, 4)).astype(np.float32)),
            [_meta(content=f"c{i}") for i in range(32)],
        )
        q = _norm(np.asarray([0, 0, 1.0, 0], np.float32))
        s.search(q, 3)
        assert s.full_uploads == 1
        s.insert_chunks_with_ids(_embs([0, 0, 1, 0]), [_meta(content="new")])
        res = s.search(q, 3)
        assert s.full_uploads == 1
        assert res[0].metadata.content == "new"

    def test_crash_mid_append_recovers_to_manifest(self, tmp_path):
        s = VectorStore(tmp_path / "db", dims=4)
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0], [0, 1, 0, 0]), [_meta(content="a"), _meta(content="b")]
        )
        s.save()
        # simulate a crash: data appended but manifest never flipped
        with open(s._embed_path(s._generation), "ab") as f:
            f.write(np.zeros(4, np.float16).tobytes())
        with open(s._log_path(s._generation), "ab") as f:
            f.write(b"\x93\xa1a\x01\x80")  # ("a", 1, {}) fragmentish garbage
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 2
        assert {m.content for m in (s2.get_chunk(0), s2.get_chunk(1))} == {"a", "b"}

    def test_v1_layout_migrates(self, tmp_path):
        import json, msgpack
        db = tmp_path / "db"
        db.mkdir()
        rows = _embs([1, 0, 0, 0], [0, 1, 0, 0])
        rows.astype(np.float16).tofile(db / "embeddings.bin")
        with open(db / "chunkmeta.msgpack", "wb") as f:
            msgpack.pack(
                {0: _meta(content="old-a").to_msgpack(), 1: _meta(content="old-b").to_msgpack()}, f
            )
        (db / "vectors.json").write_text(json.dumps(
            {"version": 1, "dims": 4, "rows": 2, "next_id": 2,
             "row_ids": [0, 1], "dtype": "float16"}
        ))
        s = VectorStore(db, dims=4)
        assert len(s) == 2
        assert s.get_chunk(0).content == "old-a"
        s.save()  # migrates to generational layout
        assert not (db / "embeddings.bin").exists()
        s2 = VectorStore(db, dims=4)
        assert len(s2) == 2 and s2.next_id() == 2


class TestScalePaths:
    """Round-3: the 10M-scale mechanisms must be exercised at test size by
    shrinking their thresholds — auto-spill, blockwise device upload, and
    lazy metadata reads through the sidecar open path."""

    def test_auto_spill_bounds_host_state(self, tmp_path, monkeypatch):
        import codesearch_tpu.vectordb.store as vstore

        monkeypatch.setattr(vstore, "SPILL_ROWS", 16)
        s = VectorStore(tmp_path / "db", dims=4)
        rng = np.random.default_rng(0)
        for batch in range(5):
            embs = _norm(rng.normal(size=(10, 4)).astype(np.float32))
            s.insert_chunks_with_ids(
                embs, [_meta(content=f"c{batch}-{i}") for i in range(10)]
            )
        # spill ran (50 rows > 16): data files exist BEFORE any save
        assert s._file_rows >= 16
        ep = s._embed_path(s._generation)
        assert ep.exists() and ep.stat().st_size == s._file_rows * 4 * 2
        # a reader opening now sees only the committed (manifest) prefix
        # — nothing, since save never ran
        with np.testing.assert_raises(Exception):
            VectorStore(tmp_path / "nope", dims=4, readonly=True)
        # searches see everything (memmap + tail stitched)
        q = _norm(np.asarray(s._rows_range(37, 38)[0], np.float32))
        res = s.search(q, 1)
        assert res[0].metadata.content == "c3-7"
        s.save()
        s2 = VectorStore(tmp_path / "db", dims=4)
        assert len(s2) == 50
        assert s2.get_chunk(res[0].chunk_id).content == "c3-7"

    def test_blockwise_full_upload_matches(self, tmp_path, monkeypatch):
        import codesearch_tpu.vectordb.store as vstore

        rng = np.random.default_rng(1)
        embs = _norm(rng.normal(size=(70, 4)).astype(np.float32))
        metas = [_meta(content=f"c{i}") for i in range(70)]

        s1 = VectorStore(tmp_path / "a", dims=4)
        s1.insert_chunks_with_ids(embs, metas)
        r1 = s1.search(_norm(embs[33:34])[0], 5)

        monkeypatch.setattr(vstore, "UPLOAD_BLOCK", 16)
        s2 = VectorStore(tmp_path / "b", dims=4)
        s2.insert_chunks_with_ids(embs, metas)
        r2 = s2.search(_norm(embs[33:34])[0], 5)
        assert [r.chunk_id for r in r1] == [r.chunk_id for r in r2]
        assert r2[0].chunk_id == 33

    def test_blockwise_full_upload_matches_int8(self, tmp_path, monkeypatch):
        import codesearch_tpu.vectordb.store as vstore

        rng = np.random.default_rng(2)
        embs = _norm(rng.normal(size=(70, 4)).astype(np.float32))
        metas = [_meta(content=f"c{i}") for i in range(70)]
        monkeypatch.setattr(vstore, "UPLOAD_BLOCK", 16)
        s = VectorStore(tmp_path / "db", dims=4, int8=True)
        s.insert_chunks_with_ids(embs, metas)
        res = s.search(_norm(embs[17:18])[0], 3)
        assert res[0].chunk_id == 17

    def test_lazy_metadata_lru_and_sidecar_open(self, tmp_path, monkeypatch):
        import codesearch_tpu.vectordb.store as vstore

        monkeypatch.setattr(vstore, "META_LRU_ENTRIES", 4)
        s = VectorStore(tmp_path / "db", dims=4)
        rng = np.random.default_rng(3)
        s.insert_chunks_with_ids(
            _norm(rng.normal(size=(30, 4)).astype(np.float32)),
            [_meta(content=f"body-{i}", path=f"f{i % 3}.rs") for i in range(30)],
        )
        s.save()
        s2 = VectorStore(tmp_path / "db", dims=4, readonly=True)
        # sidecar open: no pending metadata in memory
        assert not s2._pending_meta
        for i in (0, 7, 14, 21, 28, 3, 29):
            assert s2.get_chunk(i).content == f"body-{i}"
        assert len(s2._meta_lru) <= 4
        assert sorted(s2.get_chunks_by_file("f1.rs")) == list(range(1, 30, 3))
        assert s2.all_paths() == {"f0.rs", "f1.rs", "f2.rs"}
        # iter_chunks streams all live chunks
        seen = {cid: m.content for cid, m in s2.iter_chunks()}
        assert len(seen) == 30 and seen[11] == "body-11"

    def test_extras_overflow_defers_rebuild(self, tmp_path, monkeypatch):
        """On recent-append overflow the sorted cid index invalidates and
        rebuilds lazily at the next lookup — replaces/deletes/gets must all
        still resolve across the overflow boundary."""
        import codesearch_tpu.vectordb.store as vstore

        monkeypatch.setattr(vstore, "EXTRAS_MAX", 8)
        s = VectorStore(tmp_path / "db", dims=4)
        rng = np.random.default_rng(5)
        for i in range(30):
            s.insert_chunks_with_ids(
                _norm(rng.normal(size=(1, 4)).astype(np.float32)),
                [_meta(content=f"c{i}")], ids=[i],
            )
        assert s._sorted_cids is None        # overflow cleared, not rebuilt
        assert s.get_chunk(3).content == "c3"   # lazy rebuild covers all
        s.insert_chunks_with_ids(
            _embs([1, 0, 0, 0]), [_meta(content="replaced")], ids=[3]
        )
        assert s.get_chunk(3).content == "replaced"
        assert s.delete_chunks([7]) == 1
        assert s.get_chunk(7) is None
        assert len(s) == 29

    def test_missing_sidecars_fall_back_to_log_replay(self, tmp_path):
        """A v3 store whose sidecar files were lost must still open via the
        op-log replay path (degraded open, full data)."""
        s = VectorStore(tmp_path / "db", dims=4)
        rng = np.random.default_rng(6)
        s.insert_chunks_with_ids(
            _norm(rng.normal(size=(20, 4)).astype(np.float32)),
            [_meta(content=f"c{i}", path=f"f{i % 2}.rs") for i in range(20)],
        )
        s.delete_chunks([5])
        s.save()
        (tmp_path / "db" / f"rowidx.{s._generation}.bin").unlink()
        s2 = VectorStore(tmp_path / "db", dims=4, readonly=True)
        assert len(s2) == 19
        assert s2.get_chunk(5) is None
        assert s2.get_chunk(7).content == "c7"
        assert sorted(s2.get_chunks_by_file("f1.rs")) == [
            i for i in range(1, 20, 2) if i != 5
        ]
