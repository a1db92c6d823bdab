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
    corpus = corpus.resolve()
    import numpy as np

    from codesearch_tpu.chunker import SemanticChunker
    from codesearch_tpu.embed import EmbeddingService
    from codesearch_tpu.fileio import FileWalker
    from codesearch_tpu.fts import FtsStore
    from codesearch_tpu.rerank import rrf_fusion_with_exact
    from codesearch_tpu.search.analysis import adapt_rrf_k, detect_identifiers
    from codesearch_tpu.vectordb import ChunkMetadata, VectorStore
    import tempfile

    print(f"collecting files from {corpus} ...")
    files, _ = FileWalker(corpus, extra_excludes=exclude or []).walk()
    print(f"  {len(files)} indexable files")
    chunker = SemanticChunker(100, 4000, 5)
    all_chunks = []
    for f in files:
        try:
            content = f.path.read_text(errors="replace")
        except OSError:
            continue
        rel = f.path.relative_to(corpus)
        all_chunks.extend(chunker.chunk_semantic(f.language, rel, content))
    print(f"  {len(all_chunks)} chunks")

    # pay the tunneled-TPU first-transfer init outside the timed sections
    from codesearch_tpu.utils.device import wait_for_warmup

    wait_for_warmup(timeout=600)

    rows = []
    for model_name in models:
        print(f"\n=== {model_name} ===")
        t0 = time.time()
        svc = EmbeddingService(model_name, use_persistent_cache=False)
        load_s = time.time() - t0
        t0 = time.time()
        embedded = svc.embed_chunks(all_chunks)
        index_s = time.time() - t0
        store = VectorStore(Path(tempfile.mkdtemp()) / "db", dims=svc.dims)
        metas = [
            ChunkMetadata(
                path=e.chunk.path, content=e.chunk.content,
                start_line=e.chunk.start_line, end_line=e.chunk.end_line,
                kind=e.chunk.kind.value, context=e.chunk.context,
                signature=e.chunk.signature, docstring=e.chunk.docstring,
            )
            for e in embedded
        ]
        ids = store.insert_chunks_with_ids(
            np.stack([e.embedding for e in embedded]), metas
        )
        store.build_index()
        fts = None
        if hybrid:
            fts = FtsStore(Path(tempfile.mkdtemp()) / "fts")
            fts.add_chunks([
                (cid, m.content, m.path, m.signature, m.kind)
                for cid, m in zip(ids, metas)
            ])
            fts.commit()

        def _search(query, limit=3):
            from codesearch_tpu.search.analysis import expand_query

            variants = expand_query(query)
            hb = getattr(svc.backend, "model", None)
            if hb is not None and hasattr(hb, "table"):
                # single-dispatch path (featurize → embed+top-k in one call)
                # over the expanded variants, matching the product pipeline
                from codesearch_tpu.models.hash_embedder import batch_features

                ids_q, ws_q = batch_features(
                    [svc.spec.query_prefix + v for v in variants]
                )
                per_variant = store.search_featurized(
                    hb.table, ids_q, ws_q, limit * 3
                )
            else:
                per_variant = [
                    store.search(svc.embed_query(v), limit * 3)
                    for v in variants
                ]
            # best score per chunk across variants (search/mod.rs:513-590)
            best: dict[int, object] = {}
            for results in per_variant:
                for r in results:
                    if (r.chunk_id not in best
                            or r.score > best[r.chunk_id].score):
                        best[r.chunk_id] = r
            vres = sorted(best.values(), key=lambda r: -r.score)[:limit * 3]
            if fts is None:
                return vres[:limit]
            vk, fk = adapt_rrf_k(query)
            fres = fts.search(query, limit * 3)
            eres = []
            for ident in detect_identifiers(query):
                eres.extend(fts.search_exact(ident, limit=limit * 3))
            fused = rrf_fusion_with_exact(
                [(r.chunk_id, r.score) for r in vres],
                [(r.chunk_id, r.score) for r in fres],
                [(r.chunk_id, r.score) for r in eres],
                vector_k=vk, fts_k=fk,
            )
            by_id = {r.chunk_id: r for r in vres}

            class _Hit:
                def __init__(self, cid, score):
                    meta = by_id[cid].metadata if cid in by_id else store.get_chunk(cid)
                    self.metadata = meta
                    self.score = score

            return [_Hit(f.chunk_id, f.rrf_score) for f in fused[:limit]
                    if f.chunk_id in by_id or store.get_chunk(f.chunk_id)]

        hits, scores, q_times = 0, [], []
        for query, expect in queries:
            _search(query, 3)  # warm: trace/compile + query-cache priming
            t0 = time.time()
            res = _search(query + " ", 3)  # cache-busting suffix, same shapes
            q_times.append(time.time() - t0)
            res = _search(query, 3)
            ok = any(expect in r.metadata.path for r in res)
            hits += ok
            if res:
                scores.append(res[0].score)
            print(f"  {'✓' if ok else '✗'} {query!r} → {res[0].metadata.path if res else '-'}")
        fp = store.search(svc.embed_query(FALSE_POSITIVE_QUERY), 1)
        fp_score = fp[0].score if fp else 0.0
        acc = hits / len(queries)
        row = {
            "model": model_name,
            "dims": svc.dims,
            "chunks": len(all_chunks),
            "load_s": round(load_s, 2),
            "index_s": round(index_s, 2),
            "chunks_per_s": round(len(all_chunks) / max(index_s, 1e-9)),
            "accuracy": f"{hits}/{len(queries)} ({acc:.0%})",
            "avg_score": round(float(np.mean(scores)), 3) if scores else 0.0,
            "avg_query_ms": round(1000 * float(np.mean(q_times)), 2),
            "false_positive_score": round(float(fp_score), 3),
        }
        rows.append(row)
        print(f"  accuracy={row['accuracy']} avg_score={row['avg_score']} "
              f"query={row['avg_query_ms']}ms index={index_s:.1f}s "
              f"({row['chunks_per_s']} chunks/s)")

    if out:
        cols = list(rows[0].keys())
        lines = ["# Model benchmark", "",
                 f"corpus: `{corpus}` — {len(all_chunks)} chunks", "",
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
    ap.add_argument("--queries", choices=["self", "reference"], default="self")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    ap.add_argument("--hybrid", action="store_true",
                    help="full vector+BM25+exact RRF pipeline (vs vector-only)")
    args = ap.parse_args()
    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    queries = SELF_QUERIES if args.queries == "self" else REFERENCE_QUERIES
    # the reference labels expect src/… paths and the query strings live in
    # examples/benchmark_models.rs — exclude self-referential directories
    exclude = ["examples", "benchmarks"] if args.queries == "reference" else []
    run_benchmark(args.corpus, args.models.split(","), queries, args.out,
                  hybrid=args.hybrid, exclude=exclude)
    return 0


if __name__ == "__main__":
    sys.exit(main())
