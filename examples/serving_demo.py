"""Batched-serving demo: the three ways a wave of queries shares ONE
fused device dispatch (no reference analog — the reference serves each
request on its own thread with per-query retrieval, src/server/mod.rs).

1. library — SearchSession.search_many(queries)
2. HTTP    — POST /search {"queries": [...], "mode": "hybrid"}
3. HTTP    — concurrent single-query posts coalesced by the dynamic
             micro-batcher (watch /status batch_waves vs batched_queries)

Usage: python examples/serving_demo.py [path] [--platform cpu]
"""

from __future__ import annotations

import json
import sys
import threading
import time
import urllib.request
from pathlib import Path


def main() -> int:
    import os

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # mute XLA E-spam
    argv = sys.argv[1:]
    args: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--platform":
            if i + 1 >= len(argv):
                print("--platform requires a value (cpu|tpu)", file=sys.stderr)
                return 2
            import jax

            jax.config.update("jax_platforms", argv[i + 1])
            i += 2
            continue
        args.append(argv[i])
        i += 1
    corpus = Path(args[0] if args else "codesearch_tpu").resolve()

    from codesearch_tpu.index.pipeline import IndexOptions, index
    from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

    stats = index(corpus, IndexOptions(quiet=True))
    print(f"indexed {stats.db_path} ({stats.chunks_added} new chunks)")

    queries = [
        "parse the configuration file",
        "walk the directory tree",
        "how do we detect binary files",
        "reciprocal rank fusion",
    ]

    # ---- 1. library batched serving ------------------------------------
    session = SearchSession(stats.db_path, readonly=True)
    # warm BOTH executables (single-query AND batched wave shapes — a
    # first-use compile inside the timed region would invert the numbers);
    # warm with the same query mix so the wave shapes match exactly
    session.search("warmup query", SearchOptions(limit=5))
    session.search_many([q + " warm" for q in queries], SearchOptions(limit=5))
    t0 = time.time()
    wave = session.search_many(queries, SearchOptions(limit=5))
    wave_ms = (time.time() - t0) * 1000
    t0 = time.time()
    for q in queries:
        session.search(q + " uncached", SearchOptions(limit=5))
    seq_ms = (time.time() - t0) * 1000
    print(f"\nsearch_many: {len(queries)} queries in ONE dispatch "
          f"= {wave_ms:.0f} ms (sequential: {seq_ms:.0f} ms)")
    for q, resp in zip(queries, wave):
        top = resp.hits[0].path if resp.hits else "-"
        print(f"  {q!r:45s} -> {top}")

    # ---- 2+3. HTTP: explicit batch + dynamic micro-batching -------------
    from codesearch_tpu.server.http import make_server

    httpd, state = make_server(corpus, host="127.0.0.1", port=0,
                               initial_index=False)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def post(payload):
        req = urllib.request.Request(
            base + "/search", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        return json.loads(urllib.request.urlopen(req, timeout=120).read())

    batch = post({"queries": queries, "limit": 3, "mode": "hybrid"})
    print(f"\nHTTP queries[] batch: {len(batch['batch'])} result sets "
          f"in {batch['took_ms']} ms")

    results = [None] * 8
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        results[i] = post({"query": queries[i % 4], "limit": 3,
                           "mode": "hybrid"})

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    burst_ms = (time.time() - t0) * 1000
    status = json.loads(urllib.request.urlopen(base + "/status").read())
    print(f"8 concurrent posts: {burst_ms:.0f} ms wall; server coalesced "
          f"{status['batched_queries']} queries into "
          f"{status['batch_waves']} device waves")

    httpd.shutdown()
    httpd.server_close()
    if state.manager:
        state.manager.stop()
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
