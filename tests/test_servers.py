"""Serving layer tests: MCP JSON-RPC, HTTP endpoints, index manager
refresh/ghost scenarios, stdout discipline meta-test."""

import io
import json
import threading
import time
import urllib.request
from pathlib import Path

import pytest

from codesearch_tpu.embed import EmbeddingService
from codesearch_tpu.index import IndexOptions, index
from codesearch_tpu.index.file_meta import FileMetaStore
from codesearch_tpu.index.manager import IndexManager, SharedStores, WriterLock
from codesearch_tpu.index.pipeline import read_metadata
from codesearch_tpu.server.mcp import CodesearchService, serve_stdio
from codesearch_tpu.watch.watcher import EventKind, FileEvent


@pytest.fixture()
def indexed(tmp_repo):
    stats = index(tmp_repo, IndexOptions(quiet=True))
    return tmp_repo, stats.db_path


def _mk_service(root, db):
    meta = read_metadata(db)
    service = EmbeddingService(meta["model"])
    stores, lock = SharedStores.new_or_readonly(db, service.dims)
    manager = IndexManager(root, db, stores, service)
    return CodesearchService(root, db, stores, service, manager), lock


def _rpc(service, requests):
    stdin = io.StringIO("\n".join(json.dumps(r) for r in requests) + "\n")
    stdout = io.StringIO()
    serve_stdio(service, stdin=stdin, stdout=stdout)
    return [json.loads(line) for line in stdout.getvalue().splitlines()]


class TestMcp:
    def test_initialize_and_tools_list(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "method": "notifications/initialized"},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list"},
        ])
        assert out[0]["result"]["serverInfo"]["name"] == "codesearch-tpu"
        names = [t["name"] for t in out[1]["result"]["tools"]]
        assert names == ["semantic_search", "find_references", "index_status", "find_databases"]
        if lock:
            lock.release()

    def test_semantic_search_tool(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "semantic_search",
                        "arguments": {"query": "parse_config", "limit": 3}}},
        ])
        payload = json.loads(out[0]["result"]["content"][0]["text"])
        assert payload["results"]
        top = payload["results"][0]
        assert set(top) >= {"path", "start_line", "end_line", "kind", "score"}
        assert "content" not in top  # compact by default
        if lock:
            lock.release()

    def test_semantic_search_full_content(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "semantic_search",
                        "arguments": {"query": "parse_config", "compact": False}}},
        ])
        payload = json.loads(out[0]["result"]["content"][0]["text"])
        assert "content" in payload["results"][0]
        if lock:
            lock.release()

    def test_semantic_search_response_cache(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        try:
            a = svc.semantic_search({"query": "parse_config", "limit": 5})
            b = svc.semantic_search({"query": "parse_config", "limit": 5})
            assert b == a
            assert len(svc._resp_cache) == 1
            # caller mutation of the returned dicts must not poison the cache
            if b["results"]:
                b["results"][0]["score"] = -1
            c = svc.semantic_search({"query": "parse_config", "limit": 5})
            assert c == a
            # an index mutation invalidates (key embeds mutation counters)
            with svc.stores.lock:
                svc.stores.fts.add_chunk(999_999, "def cache_buster(): pass",
                                         "zz.py", None, "Function")
            svc.semantic_search({"query": "parse_config", "limit": 5})
            assert len(svc._resp_cache) == 2
        finally:
            if lock:
                lock.release()

    def test_find_references(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "find_references", "arguments": {"symbol": "parse_config"}}},
        ])
        payload = json.loads(out[0]["result"]["content"][0]["text"])
        assert payload["references"]
        assert any("main.py" in r["path"] for r in payload["references"])
        if lock:
            lock.release()

    def test_index_status(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "index_status", "arguments": {}}},
        ])
        payload = json.loads(out[0]["result"]["content"][0]["text"])
        assert payload["indexed"] is True
        assert payload["total_chunks"] > 0
        assert payload["status"] == "ready"
        if lock:
            lock.release()

    def test_unknown_tool_and_bad_json(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        stdin = io.StringIO(
            "this is not json\n"
            + json.dumps({"jsonrpc": "2.0", "id": 5, "method": "tools/call",
                          "params": {"name": "nope", "arguments": {}}}) + "\n"
        )
        stdout = io.StringIO()
        serve_stdio(svc, stdin=stdin, stdout=stdout)
        lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
        assert lines[0]["error"]["code"] == -32700
        assert lines[1]["error"]["code"] == -32603
        if lock:
            lock.release()

    def test_stdout_is_pure_jsonrpc(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        out_lines = _rpc(svc, [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
             "params": {"name": "semantic_search", "arguments": {"query": "hash"}}},
        ])
        for frame in out_lines:
            assert frame.get("jsonrpc") == "2.0"
        if lock:
            lock.release()


class TestStdoutDiscipline:
    def test_no_print_in_server_modules(self):
        """No raw print()/sys.stdout in MCP/search modules (would corrupt
        JSON-RPC) — mirrors the reference's source-scanning test
        (mcp/mod.rs:13-52)."""
        import re

        roots = [
            Path("codesearch_tpu/server/mcp.py"),
            Path("codesearch_tpu/server/warmup.py"),
            Path("codesearch_tpu/server/readplane.py"),
            Path("codesearch_tpu/search/pipeline.py"),
            Path("codesearch_tpu/index/manager.py"),
        ]
        pattern = re.compile(r"(?<!\w)print\(")
        for f in roots:
            src = (Path("/root/repo") / f).read_text()
            for i, line in enumerate(src.splitlines(), 1):
                stripped = line.strip()
                if stripped.startswith("#") or stripped.startswith('"'):
                    continue
                assert not pattern.search(line), f"raw print in {f}:{i}: {line.strip()}"


class TestWriterLock:
    def test_second_writer_falls_back_readonly(self, indexed):
        root, db = indexed
        l1 = WriterLock(db)
        assert l1.acquire()
        stores, l2 = SharedStores.new_or_readonly(db, 384)
        assert l2 is None
        assert stores.readonly
        l1.release()

    def test_lock_released_allows_new_writer(self, indexed):
        root, db = indexed
        l1 = WriterLock(db)
        assert l1.acquire()
        l1.release()
        l2 = WriterLock(db)
        assert l2.acquire()
        l2.release()


class TestManagerScenarios:
    """Ghost/stale-state scenarios (reference: index/manager.rs:1355-1644)."""

    def _mk(self, indexed):
        root, db = indexed
        meta = read_metadata(db)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        mgr = IndexManager(root, db, stores, service)
        return root, db, mgr, lock

    def test_ghost_file_cleaned_on_refresh(self, indexed):
        root, db, mgr, lock = self._mk(indexed)
        fm = FileMetaStore.load_or_create(db, mgr.service.model_name)
        ghost_ids = fm.chunk_ids_for(root / "src" / "lib.rs")
        assert ghost_ids
        (root / "src" / "lib.rs").unlink()
        mgr.perform_incremental_refresh()
        with mgr.stores.lock:
            for cid in ghost_ids:
                assert mgr.stores.store.get_chunk(cid) is None
        if lock:
            lock.release()

    def test_orphan_sweep(self, indexed):
        import numpy as np

        from codesearch_tpu.vectordb import ChunkMetadata

        root, db, mgr, lock = self._mk(indexed)
        with mgr.stores.lock:
            mgr.stores.store.insert_chunks_with_ids(
                np.ones((1, 384), np.float32),
                [ChunkMetadata(path="ghost.rs", content="x", start_line=0,
                               end_line=1, kind="Function")],
                ids=[99999],
            )
        swept = mgr.sweep_orphans()
        assert swept == 1
        with mgr.stores.lock:
            assert mgr.stores.store.get_chunk(99999) is None
        if lock:
            lock.release()

    def test_watcher_batch_modify_and_delete(self, indexed):
        root, db, mgr, lock = self._mk(indexed)
        new_file = root / "src" / "extra.py"
        new_file.write_text("def extra_feature():\n    return 7\n")
        victim = root / "README.md"
        victim.unlink()
        mgr.process_batch([
            FileEvent(EventKind.MODIFIED, new_file),
            FileEvent(EventKind.DELETED, victim),
        ])
        fm = FileMetaStore.load_or_create(db, mgr.service.model_name)
        assert fm.chunk_ids_for(new_file)
        assert not fm.chunk_ids_for(victim)
        with mgr.stores.lock:
            paths = mgr.stores.store.all_paths()
        assert not any("README.md" in p for p in paths)
        if lock:
            lock.release()

    def test_directory_prefix_removal(self, indexed):
        root, db, mgr, lock = self._mk(indexed)
        mgr.process_batch([FileEvent(EventKind.DELETED, root / "src")])
        fm = FileMetaStore.load_or_create(db, mgr.service.model_name)
        assert not any("src/" in p or p.endswith("main.py") for p in fm.files)
        if lock:
            lock.release()


class TestHttp:
    def test_endpoints(self, indexed):
        from codesearch_tpu.server.http import make_server

        root, db = indexed
        httpd, state = make_server(root, host="127.0.0.1", port=0, initial_index=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"
            health = json.loads(urllib.request.urlopen(base + "/health").read())
            assert health == {"status": "ok"}
            status = json.loads(urllib.request.urlopen(base + "/status").read())
            assert status["total_chunks"] > 0
            # live plane/tier serving state (VERDICT r4 #8)
            assert status["serving"]["planes_enabled"] is True
            assert "plane_builds" in status["serving"]
            req = urllib.request.Request(
                base + "/search",
                data=json.dumps({"query": "parse the configuration", "limit": 3}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            res = json.loads(urllib.request.urlopen(req).read())
            assert res["results"]
            assert len(res["results"][0]["snippet"]) <= 200
            assert "took_ms" in res
            # hybrid mode: full fused read plane + RRF via the shared
            # server read plane (round-3 addition beyond reference parity)
            hreq = urllib.request.Request(
                base + "/search",
                data=json.dumps({"query": "parse the configuration",
                                 "limit": 3, "mode": "hybrid"}).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            hres = json.loads(urllib.request.urlopen(hreq).read())
            assert hres["mode"] == "hybrid" and hres["results"]
            # unknown mode rejected
            bad_mode = urllib.request.Request(
                base + "/search",
                data=json.dumps({"query": "x", "mode": "quantum"}).encode(),
                method="POST",
            )
            try:
                urllib.request.urlopen(bad_mode)
                raise AssertionError("should have failed")
            except urllib.error.HTTPError as e:
                assert e.code == 400
            # probe: malformed body
            bad = urllib.request.Request(
                base + "/search", data=b"{not json", method="POST"
            )
            try:
                urllib.request.urlopen(bad)
                raise AssertionError("should have failed")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()
            httpd.server_close()
            if state.manager:
                state.manager.stop()


class TestDynamicBatching:
    """Round-3 serving feature: concurrent hybrid requests coalesce into
    ONE batched fused device dispatch (server/readplane.py)."""

    def _stores(self, root, db):
        meta = read_metadata(db)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        return stores, service, lock

    @staticmethod
    def _vkey(pairs):
        return [(c, round(s, 4)) for c, s in pairs]

    @staticmethod
    def _fkey(fres):
        return (None if fres is None
                else [(r.chunk_id, round(r.score, 4)) for r in fres])

    def test_device_candidates_many_matches_single(self, indexed):
        from codesearch_tpu.server.readplane import (
            device_candidates,
            device_candidates_many,
        )

        root, db = indexed
        stores, service, lock = self._stores(root, db)
        try:
            items = [
                ("parse the configuration", None, 30),
                ("walk the directory tree", None, 30),
                ("detect binary files", "function", 30),
                ("tokenize source code", None, 15),
            ]
            with stores.lock:
                many = device_candidates_many(stores, service, items)
                singles = []
                for q, k, f in items:
                    vres, fres = device_candidates(stores, service, q, k, f)
                    singles.append((
                        [(r.chunk_id, round(r.score, 4)) for r in vres],
                        self._fkey(fres),
                    ))
            assert len(many) == len(items)
            for (mv, mf), (sv, sf) in zip(many, singles):
                assert self._vkey(mv) == sv
                assert self._fkey(mf) == sf
        finally:
            if lock:
                lock.release()

    def test_dynamic_batcher_coalesces_concurrent_requests(self, indexed):
        from codesearch_tpu.server.readplane import (
            DynamicBatcher,
            device_candidates,
        )

        root, db = indexed
        stores, service, lock = self._stores(root, db)
        try:
            batcher = DynamicBatcher(stores, service, window_s=0.5)
            # simulate an active traffic stream so the first leader waits
            # the collection window (a lone request after idle skips it)
            batcher._last_arrival = time.monotonic()
            queries = [
                "parse the configuration",
                "walk the directory tree",
                "detect binary files",
                "tokenize source code",
                "read the metadata",
                "compute embedding vectors",
            ]
            results = [None] * len(queries)
            errors = []
            barrier = threading.Barrier(len(queries))

            def worker(i, q):
                try:
                    barrier.wait(timeout=10)
                    results[i] = batcher.get(q, None, 30)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)

            threads = [
                threading.Thread(target=worker, args=(i, q))
                for i, q in enumerate(queries)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=60)
            assert not errors, errors
            assert all(r is not None for r in results)
            assert batcher.batched_queries == len(queries)
            # coalescing happened: fewer dispatch waves than queries
            assert batcher.waves < len(queries)
            # results identical to the per-query fused plane
            for i, q in enumerate(queries):
                with stores.lock:
                    vres, fres = device_candidates(stores, service, q, None, 30)
                assert self._vkey(results[i][0]) == [
                    (r.chunk_id, round(r.score, 4)) for r in vres
                ]
                assert self._fkey(results[i][1]) == self._fkey(fres)
        finally:
            if lock:
                lock.release()

    def test_batcher_single_request_skips_window(self, indexed):
        from codesearch_tpu.server.readplane import DynamicBatcher

        root, db = indexed
        stores, service, lock = self._stores(root, db)
        try:
            batcher = DynamicBatcher(stores, service, window_s=5.0)
            t0 = time.time()
            vpairs, fres = batcher.get("parse the configuration", None, 30)
            assert time.time() - t0 < 4.0  # idle request did not pay window
            assert vpairs
            assert batcher.waves == 1
        finally:
            if lock:
                lock.release()

    def test_http_batch_queries_and_concurrent_hybrid(self, indexed):
        from codesearch_tpu.server.http import make_server

        root, db = indexed
        httpd, state = make_server(root, host="127.0.0.1", port=0,
                                   initial_index=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            base = f"http://127.0.0.1:{port}"

            def post(payload):
                req = urllib.request.Request(
                    base + "/search", data=json.dumps(payload).encode(),
                    headers={"Content-Type": "application/json"},
                    method="POST",
                )
                return json.loads(urllib.request.urlopen(req).read())

            qs = ["parse the configuration", "walk the directory tree"]
            # explicit batch API: one request, many queries
            batch = post({"queries": qs, "limit": 3, "mode": "hybrid"})
            assert [b["query"] for b in batch["batch"]] == qs
            singles = [post({"query": q, "limit": 3, "mode": "hybrid"})
                       for q in qs]
            for bq, sq in zip(batch["batch"], singles):
                assert bq["results"] == sq["results"]
            # queries[] demands hybrid mode
            try:
                post({"queries": qs, "mode": "vector"})
                raise AssertionError("should have failed")
            except urllib.error.HTTPError as e:
                assert e.code == 400
            # concurrent single-query hybrid posts coalesce via the
            # batcher and return per-query-correct results
            out = [None] * 4
            errs = []
            barrier = threading.Barrier(4)

            def worker(i):
                try:
                    barrier.wait(timeout=10)
                    out[i] = post({"query": qs[i % 2], "limit": 3,
                                   "mode": "hybrid"})
                except BaseException as e:  # noqa: BLE001
                    errs.append(e)

            ts = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
            for th in ts:
                th.start()
            for th in ts:
                th.join(timeout=60)
            assert not errs, errs
            for i in range(4):
                assert out[i]["results"] == singles[i % 2]["results"]
            status = json.loads(urllib.request.urlopen(base + "/status").read())
            assert status["batched_queries"] >= 4
        finally:
            httpd.shutdown()
            httpd.server_close()
            if state.manager:
                state.manager.stop()


class TestMcpPipelining:
    """Consecutive pipelined semantic_search tool calls are answered from
    ONE batched fused dispatch, responses in request order."""

    def test_pipelined_search_batch_matches_singles(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        try:
            queries = ["parse the configuration", "walk the directory tree",
                       "detect binary files"]
            reqs = [
                {"jsonrpc": "2.0", "id": 1, "method": "initialize",
                 "params": {}},
            ] + [
                {"jsonrpc": "2.0", "id": 10 + i, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": q, "limit": 3}}}
                for i, q in enumerate(queries)
            ]
            out = _rpc(svc, reqs)
            assert [o["id"] for o in out] == [1, 10, 11, 12]
            batched = [
                json.loads(o["result"]["content"][0]["text"])
                for o in out[1:]
            ]
        finally:
            if lock:
                lock.release()
        # fresh service, per-call path (no cache sharing)
        svc2, lock2 = _mk_service(root, db)
        try:
            for q, b in zip(queries, batched):
                single = svc2.semantic_search({"query": q, "limit": 3})
                assert b == single, q
        finally:
            if lock2:
                lock2.release()

    def test_pipelined_mixed_methods_keep_order(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        try:
            reqs = [
                {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "parse config", "limit": 2}}},
                {"jsonrpc": "2.0", "id": 2, "method": "ping"},
                {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "walk tree", "limit": 2}}},
                {"jsonrpc": "2.0", "id": 4, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "", "limit": 2}}},
            ]
            out = _rpc(svc, reqs)
            assert [o["id"] for o in out] == [1, 2, 3, 4]
            # the empty query in a batched group surfaces its error payload
            last = json.loads(out[3]["result"]["content"][0]["text"])
            assert last == {"error": "empty query"}
            assert out[3]["result"]["isError"] is True
        finally:
            if lock:
                lock.release()


class TestReviewFixes:
    """Round-3 review findings: per-item error isolation, wave caps,
    batch-axis shape discipline."""

    def test_pipelined_group_isolates_malformed_sibling(self, indexed):
        root, db = indexed
        svc, lock = _mk_service(root, db)
        try:
            reqs = [
                {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "parse config",
                                          "limit": 2}}},
                {"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "walk tree",
                                          "limit": "ten"}}},  # malformed
                {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
                 "params": {"name": "semantic_search",
                            "arguments": {"query": "binary files",
                                          "limit": 2}}},
            ]
            out = _rpc(svc, reqs)
            assert [o["id"] for o in out] == [1, 2, 3]
            assert "result" in out[0] and "result" in out[2]
            assert out[1].get("error", {}).get("code") == -32603
        finally:
            if lock:
                lock.release()

    def test_string_json_frames_get_responses(self, indexed):
        """A bare JSON string frame is not silently swallowed (the old
        blank-line sentinel was the in-band string \"blank\")."""
        root, db = indexed
        svc, lock = _mk_service(root, db)
        try:
            stdin = io.StringIO('"blank"\n{"jsonrpc":"2.0","id":7,"method":"ping"}\n')
            stdout = io.StringIO()
            serve_stdio(svc, stdin=stdin, stdout=stdout)
            frames = [json.loads(x) for x in stdout.getvalue().splitlines()]
            # the string frame produced SOME response frame (an error) and
            # the following ping still succeeded
            assert any(f.get("id") == 7 and "result" in f for f in frames)
            assert any("error" in f for f in frames)
        finally:
            if lock:
                lock.release()

    def test_http_queries_cap(self, indexed):
        from codesearch_tpu.server.http import make_server

        root, db = indexed
        httpd, state = make_server(root, host="127.0.0.1", port=0,
                                   initial_index=False)
        port = httpd.server_address[1]
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps({"queries": ["q"] * 65,
                                 "mode": "hybrid"}).encode(),
                method="POST",
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError("should have failed")
            except urllib.error.HTTPError as e:
                assert e.code == 400
        finally:
            httpd.shutdown()
            httpd.server_close()
            if state.manager:
                state.manager.stop()

    def test_stack_query_args_pads_batch_axis_and_checks_epoch(self, indexed):
        import numpy as np

        from codesearch_tpu.fts.store import stack_query_args

        root, db = indexed
        meta = read_metadata(db)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        try:
            stores.fts.device_min_docs = 1
            a1 = stores.fts.device_query_args("parse config", None, 10)
            a2 = stores.fts.device_query_args("search index", None, 10)
            assert a1 is not None and a2 is not None
            dev, cs, cl, kid = (stack_query_args([a1, a2])[i]
                                for i in (0, 1, 2, 4))
            # batch axis padded to the pow2 bucket with masked rows
            assert cs.shape[0] == 4
            assert (cl[2:] == 0).all() and (kid[2:] == -1).all()
            # wave sizes 3 and 4 land in the SAME bucket (one executable)
            a3 = stores.fts.device_query_args("content hash", None, 10)
            assert stack_query_args([a1, a2, a3])[1].shape[0] == 4
            # a device-epoch mismatch is rejected, not silently mis-indexed
            fake_dev = ((np.zeros(1),) + a2[0][1:],) + a2[1:]
            import pytest as _pytest
            with _pytest.raises(ValueError):
                stack_query_args([a1, fake_dev])
        finally:
            if lock:
                lock.release()


class TestServingUnderChurn:
    """Serving correctness while the index is being rewritten underneath:
    concurrent hybrid HTTP requests (riding the dynamic batcher) race a
    writer that keeps re-indexing changing files. No request may error;
    after the churn settles, results reflect the final corpus."""

    def test_concurrent_hybrid_during_reindex(self, tmp_repo):
        from codesearch_tpu.server.http import make_server

        stats = index(tmp_repo, IndexOptions(quiet=True))
        httpd, state = make_server(tmp_repo, host="127.0.0.1", port=0,
                                   initial_index=False)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        errors: list = []
        stop = threading.Event()

        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/search",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            return json.loads(urllib.request.urlopen(req, timeout=60).read())

        def reader(i):
            qs = ["parse the configuration", "search index class",
                  "content hash function"]
            try:
                while not stop.is_set():
                    out = post({"query": qs[i % 3], "limit": 3,
                                "mode": "hybrid"})
                    assert "results" in out
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        def writer():
            try:
                for gen in range(4):
                    (tmp_repo / "src" / "gen.py").write_text(
                        f"def generated_fn_{gen}(x):\n"
                        f'    """Generated helper generation {gen}."""\n'
                        f"    return x + {gen}\n"
                    )
                    if state.manager is not None:
                        state.manager.perform_incremental_refresh()
                    time.sleep(0.05)
            except BaseException as e:  # noqa: BLE001
                errors.append(e)

        readers = [threading.Thread(target=reader, args=(i,)) for i in range(3)]
        for t in readers:
            t.start()
        wt = threading.Thread(target=writer)
        wt.start()
        wt.join(timeout=120)
        stop.set()
        for t in readers:
            t.join(timeout=60)
        try:
            assert not errors, errors
            # final state is consistent: the last generation is searchable
            out = post({"query": "generated helper generation", "limit": 5,
                        "mode": "hybrid"})
            paths = [r["path"] for r in out["results"]]
            assert any("gen.py" in p for p in paths), paths
            snippets = [r["snippet"] for r in out["results"]
                        if "gen.py" in r["path"]]
            assert any("generation 3" in sn for sn in snippets), snippets
        finally:
            httpd.shutdown()
            httpd.server_close()
            if state.manager:
                state.manager.stop()


class TestBatcherOverflowPromotion:
    def test_followers_self_promote_past_max_wave(self, indexed):
        """More concurrent requests than max_wave: the leader serves only
        its wave; stranded followers must self-promote (poll the queue
        head) and serve the remainder — nobody hangs."""
        from codesearch_tpu.server.readplane import (
            DynamicBatcher,
            device_candidates,
        )

        root, db = indexed
        meta = read_metadata(db)
        service = EmbeddingService(meta["model"])
        stores, lock = SharedStores.new_or_readonly(db, service.dims)
        try:
            batcher = DynamicBatcher(stores, service, window_s=0.3,
                                     max_wave=2)
            batcher._last_arrival = time.monotonic()
            queries = [f"parse the configuration {i}" for i in range(5)]
            results = [None] * 5
            errors = []
            barrier = threading.Barrier(5)

            def worker(i):
                try:
                    barrier.wait(timeout=10)
                    results[i] = batcher.get(queries[i], None, 15)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)

            ts = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
            for t in ts:
                t.start()
            for t in ts:
                t.join(timeout=120)
            assert not errors, errors
            assert all(r is not None for r in results)
            assert batcher.batched_queries == 5
            assert batcher.waves >= 3   # ceil(5 / max_wave=2)
            for i, q in enumerate(queries):
                with stores.lock:
                    vres, fres = device_candidates(stores, service, q, None, 15)
                assert [(c, round(s, 4)) for c, s in results[i][0]] == \
                       [(r.chunk_id, round(r.score, 4)) for r in vres]
        finally:
            if lock:
                lock.release()
