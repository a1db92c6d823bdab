"""Embedding-model benchmark harness.

Parity with the reference's examples/benchmark_models.rs: indexes a corpus,
runs a labeled query set per model (accuracy = expected file in top-3),
probes a false-positive query, and writes a markdown report. Defaults to
benchmarking the weights-free models (the only ones runnable with zero
downloads); pass model names to test others (BERT-family models need local
weights in ~/.codesearch/models/<short-name>/).

Usage: python examples/benchmark_models.py [--corpus PATH] [--models a,b]
       [--queries self|reference] [--out benchmark.md] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

# Query sets are (query, expected_path_fragment, category) triples.
# Categories follow the reference's own improvement-plan benchmark design
# (exact-name vs conceptual, /root/reference/benchmarks/improvement-plan.md:
# 9-16), extended per VERDICT r4 #3:
#   exact    — the query names a real identifier from the corpus
#   concept  — describes behavior without naming any identifier
#   doc      — phrased as a question / doc-style ("how do we ...")
#   cross    — the concept spans several files; any file under the
#              expected prefix is a correct answer
CATEGORIES = ("exact", "concept", "doc", "cross")

# Labeled query set for this repository's own source (self corpus).
# The original 9 r1 queries, categorized, plus 21 added in r5 (written
# against the package as it exists — NOT tuned: committed before any
# ranking change this round was evaluated on them).
SELF_QUERIES = [
    # exact-identifier
    ("SemanticChunker structural scanning", "chunker/semantic.py", "exact"),
    ("VectorStore insert chunks", "vectordb/store.py", "exact"),
    ("FileWalker walk directory", "fileio/walker.py", "exact"),
    ("stable_u64 FNV hash", "utils/hashing.py", "exact"),
    ("bm25_resident_topk dispatch", "ops/bm25.py", "exact"),
    ("DynamicBatcher wave leader", "server/readplane.py", "exact"),
    ("detect_structural_intent query kinds", "search/analysis.py", "exact"),
    ("EmbeddingService embed_chunks_matrix", "embed/service.py", "exact"),
    # conceptual
    ("lexical masking strings comments", "chunker/lexer.py", "concept"),
    ("reciprocal rank fusion", "rerank/fusion.py", "concept"),
    ("quantize rows to int8 with per row scales", "vectordb/store.py",
     "concept"),
    ("evict least recently used cached embeddings", "embed/cache.py",
     "concept"),
    ("dedupe identical chunks by content hash", "chunker/dedup.py",
     "concept"),
    ("rotate log files and delete old ones", "utils/logger.py", "concept"),
    ("score candidate pairs with a cross encoder", "models/cross_encoder.py",
     "concept"),
    # doc-phrased
    ("how do we detect binary files", "fileio/binary.py", "doc"),
    ("where is the CLI entry point", "cli/main.py", "doc"),
    ("CLI argument parsing", "cli/main.py", "doc"),
    ("how does search degrade when device memory is exhausted",
     "search/degrade.py", "doc"),
    ("how is the wordpiece vocabulary tokenized without downloads",
     "models/tokenizer.py", "doc"),
    ("how do we keep stdout clean for protocol frames", "utils/output.py",
     "doc"),
    ("what checks does the doctor command run", "cli/doctor.py", "doc"),
    # cross-file
    ("extract function signature", "chunker/", "cross"),
    ("shard the corpus across the device mesh", "parallel/", "cross"),
    ("train the encoder with a contrastive objective", "train/", "cross"),
    ("pallas kernel for fused top-k selection", "ops/", "cross"),
    ("walk files and detect their language", "fileio/", "cross"),
    ("serve search over HTTP endpoints", "server/", "cross"),
    ("encoder forward pass with fused attention", "models/", "cross"),
    ("persist model checkpoints for resume", "train/", "cross"),
]

# Corpus B: a SECOND labeled set over this repo's own package tree —
# 10 queries written fresh in round 4 + 20 added in round 5, never used
# to tune ranking before being committed (the reference's external-repo
# protocol, benchmarks/test_external_repo.sh: quality changes must win on
# a corpus they were not tuned against). Gate ranking tweaks on BOTH this
# set and the reference set.
CORPUS_B_QUERIES = [
    # r4 originals, categorized
    ("where are file watch events coalesced and deduplicated",
     "watch/watcher.py", "doc"),
    ("polling fallback when inotify is unavailable", "watch/watcher.py",
     "concept"),
    ("atomic rename makes the manifest the commit point", "fts/store.py",
     "concept"),
    ("split oversized chunks with overlapping lines", "chunker/semantic.py",
     "concept"),
    ("stack of gitignore patterns applied per directory", "fileio/ignore.py",
     "concept"),
    ("update rows of the device matrix in place", "vectordb/store.py",
     "concept"),
    ("merge ranked result lists with reciprocal rank fusion",
     "rerank/fusion.py", "concept"),
    ("generate query variants for expansion", "search/analysis.py",
     "concept"),
    ("which files changed since the last index run", "index/file_meta.py",
     "doc"),
    ("read JSON-RPC requests from stdin", "server/mcp.py", "concept"),
    # r5 additions — exact-identifier
    ("fused_scores_topk gated kernel", "ops/", "exact"),
    ("plane_write_rows scatter build", "ops/bm25.py", "exact"),
    ("dispatch_with_degrade release and retry", "search/degrade.py",
     "exact"),
    ("SearchSession search_many batched wave", "search/pipeline.py",
     "exact"),
    ("GrowBuf append buffer", "utils/growbuf.py", "exact"),
    ("adapt_rrf_k fusion constants", "search/analysis.py", "exact"),
    ("code_tokens identifier splitting", "models/tokenizer.py", "exact"),
    # r5 additions — conceptual
    ("impact tier serves high frequency identifier lookups", "fts/store.py",
     "concept"),
    ("resident score planes for dense BM25 terms", "fts/store.py",
     "concept"),
    ("bucket chunk batches by token length", "embed/service.py", "concept"),
    ("tombstone deleted rows and compact later", "vectordb/store.py",
     "concept"),
    ("placeholder database for fast server startup", "server/mcp.py",
     "concept"),
    # r5 additions — doc-phrased
    ("how does the store recover after a crash mid commit", "fts/store.py",
     "doc"),
    ("when is a full device re-upload triggered instead of an incremental "
     "sync", "fts/store.py", "doc"),
    ("how are branch switches detected and handled", "watch/watcher.py",
     "doc"),
    ("how do we find the database directory for a project",
     "index/db_discovery.py", "doc"),
    # r5 additions — cross-file
    ("XLA collectives merge per shard top-k results", "parallel/", "cross"),
    ("mine training pairs from indexed chunks", "train/", "cross"),
    ("language specific definition patterns", "chunker/", "cross"),
    ("device BM25 scoring kernels", "ops/bm25.py", "cross"),
]

# Labeled set against the reference Rust corpus — the original 9
# (benchmark_models.rs:16-32), categorized, plus 23 added in r5.
REFERENCE_QUERIES = [
    # exact-identifier
    ("SemanticChunker struct", "src/chunker/semantic.rs", "exact"),
    ("VectorStore insert chunks", "src/vectordb/store.rs", "exact"),
    ("RustExtractor python typescript", "src/chunker/extractor.rs", "exact"),
    ("insert_chunks_with_ids vector store", "src/vectordb/store.rs",
     "exact"),
    ("rrf_fusion_with_exact three way", "src/rerank/mod.rs", "exact"),
    ("GitHeadWatcher poll head", "src/watch/mod.rs", "exact"),
    ("FileMetaStore check_file", "src/cache/file_meta.rs", "exact"),
    ("GrammarManager load_grammar", "src/chunker/grammar.rs", "exact"),
    ("NeuralReranker rerank_and_blend", "src/rerank/neural.rs", "exact"),
    ("find_deleted_files stale entries", "src/cache/file_meta.rs", "exact"),
    # conceptual
    ("extract function signature from AST", "src/chunker/extractor.rs",
     "concept"),
    ("boost signature matches over content matches", "src/fts/", "concept"),
    ("attach leading doc comments to the following definition",
     "src/chunker/semantic.rs", "concept"),
    ("retry with doubled map size when the database is full",
     "src/vectordb/store.rs", "concept"),
    ("deduplicate identical license header chunks", "src/chunker/dedup.rs",
     "concept"),
    ("blend neural scores with fusion ranks", "src/rerank/neural.rs",
     "concept"),
    ("limit how many rotated log files are kept", "src/logger/", "concept"),
    ("skip excluded directories before descending", "src/file/", "concept"),
    # doc-phrased
    ("how do we detect binary files", "src/file/binary.rs", "doc"),
    ("where is the main entry point", "src/main.rs", "doc"),
    ("CLI argument parsing clap", "src/cli/mod.rs", "doc"),
    ("how does the server start before the index is ready", "src/mcp/",
     "doc"),
    ("how are stale deleted files discovered", "src/cache/file_meta.rs",
     "doc"),
    ("which query words get expanded into variants", "src/search/mod.rs",
     "doc"),
    ("how is the embedding cache evicted when full", "src/embed/cache.rs",
     "doc"),
    ("when does a branch switch trigger a refresh", "src/index/manager.rs",
     "doc"),
    # cross-file
    ("tree-sitter grammar loading", "src/chunker/", "cross"),
    ("FileWalker walk directory", "src/file/", "cross"),
    ("MCP tools exposed to the agent", "src/mcp/", "cross"),
    ("HTTP endpoints for health status and search", "src/server/", "cross"),
    ("embedding model registry and dimensions", "src/embed/", "cross"),
    ("full text BM25 index over chunks", "src/fts/", "cross"),
    ("watch the filesystem and git head for changes", "src/watch/",
     "cross"),
    ("doctor health checks for the index", "src/cli/doctor.rs", "cross"),
]

FALSE_POSITIVE_QUERY = "kubernetes deployment yaml"


def run_benchmark(corpus: Path, models: list[str], queries, out: Path | None,
                  hybrid: bool = False, exclude: list[str] | None = None):
    """Index ``corpus`` and answer the labeled queries through the REAL
    product pipeline (index() + SearchSession.search) — query analysis,
    expansion, fusion, boosts and the test-path demotion are all measured,
    exactly what a user gets. The reference's harness likewise drives its
    real search path (examples/benchmark_models.rs:16-90)."""
    corpus = corpus.resolve()
    import shutil
    import tempfile

    import numpy as np

    from codesearch_tpu.index.pipeline import IndexOptions, index
    from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

    # pay the tunneled-TPU first-transfer init outside the timed sections
    from codesearch_tpu.utils.device import wait_for_warmup

    wait_for_warmup(timeout=600)

    mode = "hybrid" if hybrid else "vector"
    rows = []
    for model_name in models:
        print(f"\n=== {model_name} ===")
        tmp = Path(tempfile.mkdtemp())
        db = tmp / "db"
        t0 = time.time()
        stats = index(corpus, IndexOptions(
            model=model_name, quiet=True, store_path=db,
            extra_excludes=tuple(exclude or ()),
        ))
        index_s = time.time() - t0
        n_chunks = stats.chunks_added
        t0 = time.time()
        session = SearchSession(db, readonly=True)
        load_s = time.time() - t0

        def _search(query, limit=3):
            return session.search(
                query, SearchOptions(limit=limit, mode=mode)
            ).hits

        hits, scores, q_times = 0, [], []
        cat_hits: dict[str, list[int]] = {c: [0, 0] for c in CATEGORIES}
        for query, expect, cat in queries:
            _search(query, 3)  # warm: trace/compile + query-cache priming
            t0 = time.time()
            res = _search(query + " ", 3)  # cache-busting suffix, same shapes
            q_times.append(time.time() - t0)
            res = _search(query, 3)
            ok = any(expect in h.path for h in res)
            hits += ok
            cat_hits[cat][0] += ok
            cat_hits[cat][1] += 1
            if res:
                scores.append(res[0].score)
            print(f"  {'✓' if ok else '✗'} [{cat}] {query!r} → "
                  f"{res[0].path if res else '-'}")
        fp = _search(FALSE_POSITIVE_QUERY, 1)
        fp_score = fp[0].score if fp else 0.0
        acc = hits / len(queries)
        row = {
            "model": model_name,
            "dims": session.service.dims,
            "chunks": n_chunks,
            "load_s": round(load_s, 2),
            "index_s": round(index_s, 2),
            "chunks_per_s": round(n_chunks / max(index_s, 1e-9)),
            "accuracy": f"{hits}/{len(queries)} ({acc:.0%})",
            **{
                f"acc_{c}": f"{h}/{n}" for c, (h, n) in cat_hits.items()
                if n
            },
            "avg_score": round(float(np.mean(scores)), 3) if scores else 0.0,
            "avg_query_ms": round(1000 * float(np.mean(q_times)), 2),
            "false_positive_score": round(float(fp_score), 3),
        }
        rows.append(row)
        print(f"  accuracy={row['accuracy']} avg_score={row['avg_score']} "
              f"query={row['avg_query_ms']}ms index={index_s:.1f}s "
              f"({row['chunks_per_s']} chunks/s)")
        shutil.rmtree(tmp, ignore_errors=True)

    if out:
        cols = list(rows[0].keys())
        lines = ["# Model benchmark", "",
                 f"corpus: `{corpus}` — {rows[-1]['chunks']} chunks "
                 f"(product pipeline: index() + SearchSession, "
                 f"mode={mode})", "",
                 "| " + " | ".join(cols) + " |",
                 "|" + "---|" * len(cols)]
        for r in rows:
            lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")
        out.write_text("\n".join(lines) + "\n")
        print(f"\nreport written to {out}")
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=Path, default=Path("codesearch_tpu"))
    ap.add_argument("--models", default="code-hash-384,code-hash-768")
    ap.add_argument("--queries", choices=["self", "reference", "corpus-b"],
                    default="self")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--hybrid", action="store_true",
                    help="full vector+BM25+exact RRF pipeline (vs vector-only)")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    queries = {"self": SELF_QUERIES, "reference": REFERENCE_QUERIES,
               "corpus-b": CORPUS_B_QUERIES}[args.queries]
    # exclude self-referential directories for BOTH corpora: the labeled
    # query strings live verbatim in examples/benchmark_models.{rs,py} and
    # benchmarks/*.md, and a literal copy of a query always outranks the
    # code it asks about
    exclude = ["examples", "benchmarks"]
    run_benchmark(args.corpus, args.models.split(","), queries, args.out,
                  hybrid=args.hybrid, exclude=exclude)
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
