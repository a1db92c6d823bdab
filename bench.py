"""Headline benchmark (run by the driver on real TPU hardware).

Measures single-chip exact cosine top-10 retrieval throughput over a
1M-chunk corpus (384d, bf16, device-resident) — the workload class of
BASELINE.json ("QPS + recall@10 on 1M code chunks"). Recall@10 is exactly
1.0 by construction: the engine does exact brute-force search (the
reference's arroy ANN is approximate).

Baseline: the reference answers one hybrid query in ~75 ms on CPU
(README.md:691) ⇒ ~13.3 QPS single-stream. vs_baseline = our QPS / 13.3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
"""

from __future__ import annotations

import json
import sys
import time

import os

# Scale knobs (BASELINE.json configs): default = 1M bf16; BENCH_ROWS=10485760
# BENCH_INT8=1 covers the 10M-chunk int8 single-chip configuration.
N_ROWS = int(os.environ.get("BENCH_ROWS", 1 << 20))  # tile-aligned → fused kernel
DIMS = int(os.environ.get("BENCH_DIMS", 384))
Q_BATCH = int(os.environ.get("BENCH_Q", 64))
INT8 = bool(int(os.environ.get("BENCH_INT8", "0")))
TOP_K = 10
BASELINE_QPS = 1000.0 / 75.0  # reference: ~75 ms/query hybrid, CPU
# product bench: full SearchSession hybrid over a ≥1M-chunk synthetic index
# (real expansion/fusion/materialization); 0 skips it
PRODUCT_ROWS = int(os.environ.get("BENCH_PRODUCT_ROWS", 1 << 20))
# second product row: a bge-small-arch (JAX encoder) index exercising the
# model-agnostic fused read plane (VERDICT r3 item 1); 0 skips it
PRODUCT_BERT_ROWS = int(os.environ.get("BENCH_PRODUCT_BERT_ROWS", 1 << 18))
# third product row: int8 store + int8 fused kernel at 1M (VERDICT r4 weak
# #6: every round's driver artifact must carry int8 hybrid/index evidence,
# not just probe prose); 0 skips it. Skipped automatically when the main
# product row is already int8 (the 10M recipe) — it would be a duplicate.
PRODUCT_INT8_ROWS = int(os.environ.get("BENCH_PRODUCT_INT8_ROWS", 1 << 20))


def _mem(tag: str) -> None:
    """Per-phase device-HBM ledger to stderr (stdout carries only the JSON
    line). The 10M int8 configuration runs within ~1.5 GB of the chip's
    capacity; when a phase OOMs, this attributes the residency instead of
    requiring a forensic session. Backends without memory_stats (CPU) are
    silently skipped."""
    try:
        import jax

        s = jax.local_devices()[0].memory_stats() or {}
        gib = 1 << 30
        sys.stderr.write(
            f"[hbm {tag}] in_use={s.get('bytes_in_use', 0) / gib:.2f}GiB "
            f"peak={s.get('peak_bytes_in_use', 0) / gib:.2f}GiB "
            f"limit={s.get('bytes_limit', 0) / gib:.2f}GiB\n"
        )
        sys.stderr.flush()
    except Exception:
        pass


def bench_product(
    n_rows: int, model: str = "code-hash-384", int8: bool | None = None
) -> dict:
    """The PRODUCT, not the kernel: build a synthetic n_rows-chunk index
    through the real write plane (prepare_text → tokenize/featurize → embed →
    store insert → FTS), then time full SearchSession.search() hybrid queries
    (expansion ≤9 variants, fused single-dispatch retrieval, 3-way RRF,
    boosts, metadata materialization). Numbers to beat: reference hybrid
    ~75 ms/query, index 51 chunks/s (BASELINE.md rows 1-4). With a
    BERT-family ``model`` the encoder forward fuses into the same single
    dispatch (random-init weights in this zero-egress env — identical
    compute/latency profile to real weights)."""
    import shutil
    import tempfile
    from pathlib import Path

    import numpy as np

    from codesearch_tpu.chunker import Chunk, ChunkKind
    from codesearch_tpu.embed import EmbeddingService
    from codesearch_tpu.fts import FtsStore
    from codesearch_tpu.index.pipeline import write_metadata
    from codesearch_tpu.search.pipeline import SearchOptions, SearchSession
    from codesearch_tpu.vectordb import ChunkMetadata, VectorStore

    verbs = ["parse", "walk", "render", "compute", "merge", "flush", "encode",
             "resolve", "validate", "dispatch", "batch", "cache", "track",
             "scan", "load"]
    nouns = ["config", "tree", "buffer", "index", "token", "matrix", "query",
             "chunk", "socket", "widget", "metric", "schema", "branch",
             "vector", "posting"]

    # BENCH_DB_DIR: persist the synthetic index and SKIP the build when it
    # already exists — debugging the query phase at 10M otherwise re-pays a
    # ~25 min indexing run per iteration. Unset (the driver default) keeps
    # the build-timed tmpdir behavior.
    if int8 is None:
        int8 = INT8
    keep_dir = os.environ.get("BENCH_DB_DIR")
    # per-config subdir: the bf16, int8 and bert rows must never share a
    # persisted store (dtype/model mismatch would poison the reuse path)
    cfg = f"{model}-{'int8' if int8 else 'bf16'}-{n_rows}"
    td = Path(keep_dir) / cfg if keep_dir else Path(
        tempfile.mkdtemp(prefix="codesearch-bench-"))
    td.mkdir(parents=True, exist_ok=True)
    reuse = bool(keep_dir) and (td / "db" / "fts" / "fts.json").exists()
    try:
        svc = EmbeddingService(model, use_persistent_cache=False)
        store = VectorStore(td / "db", dims=svc.dims, int8=int8)
        fts = FtsStore(td / "db" / "fts")
        t0 = time.time()
        done = 0
        slab = 8192
        # per-phase wall clock (regression forensics: VERDICT r3 weak #2 —
        # the driver-measured e2e c/s dropped 43% between rounds with no
        # committed explanation; phases make the next drop attributable)
        ph = {"gen": 0.0, "embed": 0.0, "vstore": 0.0, "fts": 0.0,
              "commit": 0.0}
        while not reuse and done < n_rows:
            n = min(slab, n_rows - done)
            tp = time.time()
            chunks = []
            for i in range(done, done + n):
                v, o = verbs[i % 15], nouns[(i // 15) % 15]
                # every 4th chunk references a shared snake-case identifier
                # → df = n/4 for "common_util", probing search_exact's
                # vectorized gather at realistic high-df scale; "helper_util"
                # (same df, offset phase) exists so a WARM identifier query
                # can compile the identifier-class executables/plane buckets
                # before the cold row measures common_util (servers prewarm
                # executables; the cold row isolates per-TERM cost: score-
                # plane scatter build + exact-tier sidecar read)
                extra = "    common_util.sync(arg)\n" if i % 4 == 0 else (
                    "    helper_util.sync(arg)\n" if i % 4 == 2 else "")
                body = (
                    f"def {v}_{o}_{i}(arg):\n"
                    f'    """{v.capitalize()} the {o} and return the result."""\n'
                    f"{extra}"
                    f"    return arg.{o} + {i}\n"
                )
                # 64 chunks/file, path depends ONLY on the file group —
                # realistic file sharing (interned path tables assume paths
                # repeat; a path-per-chunk corpus costs ~350 B/chunk of
                # Python string heap in each store at 10M rows)
                g = i // 64
                chunks.append(Chunk(
                    content=body, start_line=0, end_line=3,
                    kind=ChunkKind.FUNCTION,
                    path=f"src/{nouns[g % 15]}/mod_{g}.py",
                    signature=f"def {v}_{o}_{i}(arg)",
                ))
            ph["gen"] += time.time() - tp
            tp = time.time()
            embs = svc.embed_chunks_matrix(chunks)
            ph["embed"] += time.time() - tp
            tp = time.time()
            metas = [ChunkMetadata(
                path=c.path, content=c.content, start_line=c.start_line,
                end_line=c.end_line, kind=c.kind.value, signature=c.signature,
                hash=c.hash, language="Python",
            ) for c in chunks]
            ids = store.insert_chunks_with_ids(embs, metas)
            ph["vstore"] += time.time() - tp
            tp = time.time()
            fts.add_chunks([
                (cid, m.content, m.path, m.signature, m.kind)
                for cid, m in zip(ids, metas)
            ])
            ph["fts"] += time.time() - tp
            done += n
            if done % 65536 == 0:
                tp = time.time()
                fts.commit()
                ph["commit"] += time.time() - tp
        index_cps = n_rows / (time.time() - t0)
        if not reuse:
            tp = time.time()
            store.build_index()
            store.save()
            fts.commit()
            ph["commit"] += time.time() - tp
        index_phases_s = {k: round(v, 1) for k, v in ph.items()}

        class _S:
            primary_language = "Python"

        _S.int8 = int8

        if not reuse:
            write_metadata(td / "db", svc, _S())
        else:
            index_cps = 0.0  # build skipped — no meaningful rate
        # Drop the WRITER's stores before the session opens its own: the
        # writer's device-resident matrix (6.4 GB at 10M int8) would
        # otherwise stay alive alongside the session's re-upload — at 10M
        # that duplication plus resident postings left no HBM for the r4
        # score planes (observed RESOURCE_EXHAUSTED at first search).
        del store, fts

        session = SearchSession(td / "db", readonly=True)
        queries = [
            f"{v} the {o} and return it" for v in verbs[:8] for o in nouns[:4]
        ]
        # sanity: retrieval works on the synthetic corpus
        probe = session.search("validate the schema and return it",
                               SearchOptions(limit=10))
        assert probe.hits, "product bench: no hits on synthetic corpus"
        _mem("probe")
        for q in queries[:4]:
            session.search(q, SearchOptions(limit=10))
        _mem("warm")
        lat_h = []
        for q in queries:
            t1 = time.time()
            session.search(q, SearchOptions(limit=10))
            lat_h.append((time.time() - t1) * 1000)
        _mem("hybrid")
        lat_v = []
        for q in queries:
            t1 = time.time()
            session.search(q + " now", SearchOptions(limit=10, mode="vector"))
            lat_v.append((time.time() - t1) * 1000)
        _mem("vector")
        # identifier-bearing queries: "common_util" has df = rows/4, driving
        # search_exact's high-df gather (VERDICT r3 item 3 probe) on top of
        # the fused dispatch
        ident_queries = [
            f"{v} the {o} with common_util" for v in verbs[:4] for o in nouns[:4]
        ]
        # Shape warmup on the OTHER identifier: compiles the identifier-
        # class executables and the plane-build bucket (same df → same pow2
        # shapes as common_util) without touching common_util's planes or
        # tiers — exactly what a serving warmup does.
        session.search("resolve the helper_util reference",
                       SearchOptions(limit=10))
        # COLD identifier: the first common_util lookup in this session pays
        # the per-TERM cold path end-to-end — score-plane scatter builds for
        # its subtokens (r4) + the persisted exact-tier sidecar mmap read
        # (previously a 100-300 ms posting scan at 10M).
        t1 = time.time()
        session.search("resolve the common_util reference",
                       SearchOptions(limit=10))
        ident_cold_ms = (time.time() - t1) * 1000
        for q in ident_queries[:2]:
            session.search(q, SearchOptions(limit=10))
        lat_i = []
        for q in ident_queries:
            t1 = time.time()
            session.search(q, SearchOptions(limit=10))
            lat_i.append((time.time() - t1) * 1000)
        _mem("ident")
        # batched serving: waves of 16 distinct queries through ONE fused
        # dispatch (SearchSession.search_many) — the concurrent-load
        # product throughput. Warm the wave-shape executables first: the
        # batched kernel is a different executable from the single-query
        # one, and a first-use compile inside the timed loop would
        # understate the steady state.
        wave_n = 16
        session.search_many(
            [f"warm the {nouns[j % 15]} shape w{j}" for j in range(wave_n)],
            SearchOptions(limit=10),
        )
        _mem("wave-warm")
        batch_lat = []
        for w in range(4):
            wave = [
                f"{verbs[(w * 3 + j) % 15]} the {nouns[(j * 2 + w) % 15]} "
                f"value wave{w}" for j in range(wave_n)
            ]
            t1 = time.time()
            session.search_many(wave, SearchOptions(limit=10))
            batch_lat.append(time.time() - t1)
        _mem("waves")
        batch_lat.sort()
        batched_qps = wave_n / batch_lat[len(batch_lat) // 2]
        lat_h.sort()
        lat_v.sort()
        lat_i.sort()

        def _pct(lat: list, q: float) -> float:
            # nearest-rank percentile over the sorted sample
            return lat[min(len(lat) - 1, int(q * len(lat)))]

        p50_h = _pct(lat_h, 0.5)
        p50_v = _pct(lat_v, 0.5)
        p50_i = _pct(lat_i, 0.5)
        import resource

        peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        rss_anon_mb = 0.0
        try:
            for line in open("/proc/self/status"):
                if line.startswith("RssAnon"):
                    rss_anon_mb = int(line.split()[1]) / 1024
        except OSError:
            pass
        return {
            "rows": n_rows,
            "model": model,
            "int8": int8,
            "host_peak_rss_mb": round(peak_rss_mb, 0),
            "host_rss_anon_end_mb": round(rss_anon_mb, 0),
            "index_chunks_per_s_e2e": round(index_cps, 0),
            "index_vs_cpu_onnx_51cps": round(index_cps / 51.0, 1),
            "index_phases_s": index_phases_s,
            "hybrid_p50_ms": round(p50_h, 1),
            "hybrid_mean_ms": round(sum(lat_h) / len(lat_h), 1),
            # tail visibility (VERDICT r4 weak #2): the reference's ~75 ms
            # is a TYPICAL latency — the artifact must show the whole
            # distribution, not a p50-only claim
            "hybrid_p90_ms": round(_pct(lat_h, 0.9), 1),
            "hybrid_p99_ms": round(_pct(lat_h, 0.99), 1),
            "hybrid_max_ms": round(lat_h[-1], 1),
            "plane_prewarms": session.fts.plane_prewarms,
            "plane_builds_in_queries": session.fts.plane_builds
            - session.fts.plane_prewarms,
            "hybrid_qps_single_stream": round(1000.0 / max(p50_h, 1e-9), 1),
            "hybrid_qps_batched_16": round(batched_qps, 1),
            "vector_p50_ms": round(p50_v, 1),
            "hybrid_identifier_p50_ms": round(p50_i, 1),
            "hybrid_identifier_cold_ms": round(ident_cold_ms, 1),
            "hybrid_vs_baseline_75ms": round(75.0 / max(p50_h, 1e-9), 1),
        }
    finally:
        if not keep_dir:
            shutil.rmtree(td, ignore_errors=True)


def _wait_for_tunnel() -> None:
    """Block until the TPU tunnel serves BOTH transfer directions AT
    USABLE BANDWIDTH, bounded by BENCH_TUNNEL_WAIT_S (default 30 min),
    then return; exit rc 3 if it never recovers. The tunnel has been
    observed fully down for hours (r3), PARTIALLY down (r5: compute and
    host→device fine, device→host readback wedged indefinitely), and
    DEGRADED (late r5: an 8×8 round-trip passes in seconds while a 6 MB
    readback takes 281 s — ~1000× under healthy d2h; a 10M build froze
    mid-embed for >12 min while small probes kept succeeding). So the
    probe times a bulk [4096,384] fp16 readback (3 MB, the bulk-embed
    transfer class) and fails it past BENCH_TUNNEL_BULK_S (default 60 s;
    healthy: <5 s, degraded: ~140 s) — the small round-trip runs first to
    absorb per-process tunnel init. Each probe runs in a SUBPROCESS so a
    wedged transfer never poisons this process's axon client; probing is
    skipped on BENCH_PLATFORM=cpu."""
    if os.environ.get("BENCH_PLATFORM", "") not in ("", "auto"):
        return
    import subprocess
    import sys

    bulk_s = float(os.environ.get("BENCH_TUNNEL_BULK_S", "60"))
    probe = (
        "import time, numpy as np, jax.numpy as jnp;"
        "np.asarray(jnp.ones((8,8)) @ jnp.ones((8,8)));"
        "x = jnp.ones((4096, 384), jnp.float16);"
        "x.block_until_ready();"
        "t0 = time.time();"
        "np.asarray(x);"
        f"assert time.time() - t0 < {bulk_s}, 'd2h degraded'"
    )
    deadline = time.time() + float(os.environ.get("BENCH_TUNNEL_WAIT_S", "1800"))
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            subprocess.run(
                [sys.executable, "-c", probe], timeout=300,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                check=True,
            )
            if attempt > 1:
                print(f"[tunnel] recovered on probe {attempt} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            return
        except Exception:
            remaining = deadline - time.time()
            print(f"[tunnel] probe {attempt} failed after "
                  f"{time.time() - t0:.0f}s ({remaining:.0f}s left)",
                  flush=True)
            if remaining <= 0:
                print("[tunnel] TPU round-trip unavailable for the whole "
                      "wait budget — aborting (rerun when the tunnel is up, "
                      "or BENCH_PLATFORM=cpu for a CPU smoke run)",
                      flush=True)
                raise SystemExit(3)
            time.sleep(min(120.0, max(remaining, 1.0)))


def main() -> None:
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    _wait_for_tunnel()
    import jax

    # BENCH_PLATFORM=cpu runs the whole harness on the CPU backend (smoke
    # tests / tunnel outages). Env vars like JAX_PLATFORMS are consumed by
    # this rig's sitecustomize before user code, so only jax.config works.
    plat = os.environ.get("BENCH_PLATFORM", "")
    if plat and plat != "auto":
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    import numpy as np

    import codesearch_tpu  # noqa: F401  (configures the compilation cache)
    from codesearch_tpu.ops.topk import cosine_topk
    from codesearch_tpu.utils.device import wait_for_warmup

    t_setup = time.time()
    backend = jax.default_backend()
    # warm the device→host transfer path (one-time tunnel init) while the
    # corpus generates on device
    wait_for_warmup(timeout=0)

    # synthetic corpus, generated on device (no host transfer)
    key = jax.random.PRNGKey(0)
    valid = jnp.ones((N_ROWS,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q_BATCH, DIMS), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    if INT8:
        # generate int8 directly (a bf16 intermediate at 10M rows would OOM);
        # constant row scale — ranking characteristics are unchanged
        from codesearch_tpu.ops.topk import cosine_topk_int8

        # generate per-block: the PRNG's uint32 intermediates OOM at 10M rows
        block = min(N_ROWS, 1 << 20)
        corpus_q = jnp.zeros((N_ROWS, DIMS), jnp.int8)
        for b in range(N_ROWS // block):
            bits = jax.random.bits(
                jax.random.fold_in(key, b), (block, DIMS), jnp.uint8
            )
            corpus_q = jax.lax.dynamic_update_slice(
                corpus_q, jax.lax.bitcast_convert_type(bits, jnp.int8),
                (b * block, 0),
            )
        row_scale = jnp.full((N_ROWS,), 1.0 / 127.0, jnp.float32)
        corpus_q.block_until_ready()
        corpus = None

        def run(q, k):
            return cosine_topk_int8(q, corpus_q, row_scale, valid, k)
    else:
        corpus = jax.random.normal(key, (N_ROWS, DIMS), jnp.bfloat16)
        norms = jnp.maximum(
            jnp.linalg.norm(corpus.astype(jnp.float32), axis=1, keepdims=True), 1e-6
        )
        corpus = (corpus.astype(jnp.float32) / norms).astype(jnp.bfloat16)
        corpus.block_until_ready()

        def run(q, k):
            return cosine_topk(q, corpus, valid, k)

    # compile + correctness probe: a corpus row must retrieve itself top-1
    if INT8:
        probe = corpus_q[123:124].astype(jnp.float32)
        probe = probe / jnp.linalg.norm(probe)
    else:
        probe = corpus[123:124].astype(jnp.float32)
    pv, pi = run(probe, TOP_K)
    wait_for_warmup(timeout=600)
    pi_host = int(jax.device_get(pi)[0, 0])
    assert pi_host == 123, f"exactness probe failed: {pi_host}"
    setup_s = time.time() - t_setup

    # timed steady-state loop (enough iterations to average out the
    # tunnel's dispatch jitter — measured 3.3-5.0 ms/batch spread at 15)
    iters_warm, iters = 5, 40
    for _ in range(iters_warm):
        v, i = run(queries, TOP_K)
    v.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        v, i = run(queries, TOP_K)
    v.block_until_ready()
    dt = time.time() - t0
    qps = Q_BATCH * iters / dt
    ms_per_batch = dt / iters * 1000

    # secondary: embedding throughput, chunks/s
    # (a) weights-free hash model
    from codesearch_tpu.models.hash_embedder import embed_features, make_table

    table = make_table(DIMS)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1024, 128), 0, 65536, jnp.int32)
    ws = jnp.ones((1024, 128), jnp.float32)
    out = embed_features(table, ids, ws)
    out.block_until_ready()
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = embed_features(table, ids, ws)
    out.block_until_ready()
    embed_cps = 1024 * reps / (time.time() - t0)

    # (b) flagship BERT-class encoder (bge-small arch, 12L/384H), seq 128 —
    # the reference's CPU ONNX path embeds ~51 chunks/s (demongrep_vs_osgrep).
    # BENCH_ENCODER=0 skips these rows (a 256×512 12-layer forward is
    # minutes-per-rep on a CPU smoke run; the driver's TPU run keeps them).
    bert_cps = bert_cps_512 = bert_cps_mixed = 0.0
    if bool(int(os.environ.get("BENCH_ENCODER", "1"))):
        from codesearch_tpu.models.encoder import encode, init_params
        from codesearch_tpu.models.registry import MODELS

        cfg = MODELS["bge-small"].arch
        params = init_params(jax.random.PRNGKey(3), cfg)

        def bench_encode(bsz: int, seq: int, reps: int = 5) -> float:
            bids = jax.random.randint(
                jax.random.PRNGKey(4), (bsz, seq), 0, cfg.vocab_size, jnp.int32
            )
            bmask = jnp.ones((bsz, seq), jnp.int32)
            out_b = encode(params, bids, bmask, cfg)
            out_b.block_until_ready()
            t0 = time.time()
            for _ in range(reps):
                out_b = encode(params, bids, bmask, cfg)
            out_b.block_until_ready()
            return bsz * reps / (time.time() - t0)

        bert_cps = bench_encode(256, 128)
        # seq-512 = worst-case long chunks (real usage buckets 16..512); this
        # is matmul-envelope-bound: ~26.6 GFLOPs/chunk against the ~40 TF
        # envelope this chip sustains on h=384-wide shapes
        bert_cps_512 = bench_encode(256, 512)
        # realistic MIXED-length indexing throughput: the bucket distribution
        # measured on the reference corpus itself (prepare_text → tokenizer,
        # pow2 buckets; 1,149 chunks, mean 160 tokens): what a real `index`
        # run pays per chunk, not the all-512 worst case
        mix = [(32, 0.084), (64, 0.218), (128, 0.316), (256, 0.185),
               (512, 0.198)]
        per_bucket_cps = {seq: bench_encode(256, seq, reps=3)
                          for seq, _ in mix}
        # harmonic mix: seconds/chunk weighted by bucket frequency
        bert_cps_mixed = 1.0 / sum(
            frac / max(per_bucket_cps[seq], 1e-9) for seq, frac in mix
        )

    # free the kernel-phase device buffers before the product phase builds
    # its own device-resident index: at 10M int8 the kernel corpus (4 GB)
    # plus the product matrix (pow2 capacity, 6.4 GB) plus resident FTS
    # postings exceed one chip's HBM (observed RESOURCE_EXHAUSTED, r4)
    def _free(*arrs):
        for a in arrs:
            try:
                a.delete()
            except Exception:
                pass

    run = None  # noqa: F841  (drops the closure's corpus references)
    _free(corpus, corpus_q if INT8 else None, row_scale if INT8 else None,
          valid, queries, v, i, pv, pi, probe)
    corpus = None

    product = bench_product(PRODUCT_ROWS) if PRODUCT_ROWS else None
    # second product row: the model-agnostic fused read plane with a real
    # encoder forward in the dispatch (bge-small arch, 12L/384H)
    product_bert = (
        bench_product(PRODUCT_BERT_ROWS, model="bge-small")
        if PRODUCT_BERT_ROWS else None
    )
    # third product row: int8 store + int8 fused kernels, driver-visible
    # every round (VERDICT r4 weak #6). Redundant when the main product row
    # already ran int8 (the 10M recipe sets BENCH_INT8=1).
    product_int8 = (
        bench_product(PRODUCT_INT8_ROWS, int8=True)
        if PRODUCT_INT8_ROWS and not (INT8 and PRODUCT_ROWS) else None
    )

    print(
        json.dumps(
            {
                "metric": (
                    f"exact_top10_qps_{N_ROWS // 1024 // 1024}M_chunks_{DIMS}d_"
                    + ("int8" if INT8 else "bf16")
                ),
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 1),
                "details": {
                    "backend": backend,
                    "recall_at_10": 1.0,
                    "batch": Q_BATCH,
                    "ms_per_64q_batch": round(ms_per_batch, 2),
                    "embed_chunks_per_s_hash_model": round(embed_cps, 0),
                    "embed_chunks_per_s_bge_small_arch": round(bert_cps, 0),
                    "embed_chunks_per_s_bge_small_seq512": round(bert_cps_512, 0),
                    "embed_chunks_per_s_bge_small_mixed": round(bert_cps_mixed, 0),
                    "embed_vs_cpu_onnx_51cps": round(bert_cps / 51.0, 1),
                    "embed_seq512_vs_cpu_onnx_51cps": round(bert_cps_512 / 51.0, 1),
                    "embed_mixed_vs_cpu_onnx_51cps": round(bert_cps_mixed / 51.0, 1),
                    # batch-axis DP is embarrassingly parallel (no cross-
                    # device traffic in the forward); equivalence of the
                    # sharded encode is ASSERTED in __graft_entry__
                    # .dryrun_multichip on an 8-device mesh every driver run
                    "embed_seq512_v5e8_projected_cps": round(bert_cps_512 * 8, 0),
                    "embed_seq512_v5e8_projected_vs_51cps": round(
                        bert_cps_512 * 8 / 51.0, 1),
                    "setup_s": round(setup_s, 1),
                    "product": product,
                    "product_bert": product_bert,
                    "product_int8": product_int8,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
