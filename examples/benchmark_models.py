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

# Labeled query set for this repository's own source (self corpus)
SELF_QUERIES = [
    ("SemanticChunker structural scanning", "chunker/semantic.py"),
    ("VectorStore insert chunks", "vectordb/store.py"),
    ("lexical masking strings comments", "chunker/lexer.py"),
    ("extract function signature", "chunker/"),
    ("how do we detect binary files", "fileio/binary.py"),
    ("where is the CLI entry point", "cli/main.py"),
    ("CLI argument parsing", "cli/main.py"),
    ("FileWalker walk directory", "fileio/walker.py"),
    ("reciprocal rank fusion", "rerank/fusion.py"),
]

# Corpus B: a SECOND labeled set over this repo's own package tree —
# 10 queries written fresh in round 4, never used to tune ranking in
# rounds 1-3 (the reference's external-repo protocol,
# benchmarks/test_external_repo.sh: quality changes must win on a corpus
# they were not tuned against). Gate ranking tweaks on BOTH this set and
# the reference set.
CORPUS_B_QUERIES = [
    ("where are file watch events coalesced and deduplicated", "watch/watcher.py"),
    ("polling fallback when inotify is unavailable", "watch/watcher.py"),
    ("atomic rename makes the manifest the commit point", "fts/store.py"),
    ("split oversized chunks with overlapping lines", "chunker/semantic.py"),
    ("stack of gitignore patterns applied per directory", "fileio/ignore.py"),
    ("update rows of the device matrix in place", "vectordb/store.py"),
    ("merge ranked result lists with reciprocal rank fusion", "rerank/fusion.py"),
    ("generate query variants for expansion", "search/analysis.py"),
    ("which files changed since the last index run", "index/file_meta.py"),
    ("read JSON-RPC requests from stdin", "server/mcp.py"),
]

# Labeled set against the reference Rust corpus (benchmark_models.rs:16-32)
REFERENCE_QUERIES = [
    ("SemanticChunker struct", "src/chunker/semantic.rs"),
    ("VectorStore insert chunks", "src/vectordb/store.rs"),
    ("tree-sitter grammar loading", "src/chunker/"),
    ("extract function signature from AST", "src/chunker/extractor.rs"),
    ("how do we detect binary files", "src/file/binary.rs"),
    ("where is the main entry point", "src/main.rs"),
    ("CLI argument parsing clap", "src/cli/mod.rs"),
    ("FileWalker walk directory", "src/file/"),
    ("RustExtractor python typescript", "src/chunker/extractor.rs"),
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
        for query, expect in queries:
            _search(query, 3)  # warm: trace/compile + query-cache priming
            t0 = time.time()
            res = _search(query + " ", 3)  # cache-busting suffix, same shapes
            q_times.append(time.time() - t0)
            res = _search(query, 3)
            ok = any(expect in h.path for h in res)
            hits += ok
            if res:
                scores.append(res[0].score)
            print(f"  {'✓' if ok else '✗'} {query!r} → "
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
