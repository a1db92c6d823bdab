"""Minimum end-to-end slice demo (reference: examples/semantic_demo.rs).

Walks a repo, chunks it, embeds on device, and answers queries — no FTS,
no rerank, no persistence. Usage: python examples/semantic_demo.py [path]
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def main() -> int:
    corpus = Path(sys.argv[1] if len(sys.argv) > 1 else "codesearch_tpu").resolve()
    from codesearch_tpu.chunker import SemanticChunker
    from codesearch_tpu.embed import EmbeddingService
    from codesearch_tpu.fileio import FileWalker
    from codesearch_tpu.vectordb import ChunkMetadata, VectorStore

    t0 = time.time()
    files, stats = FileWalker(corpus).walk()
    chunker = SemanticChunker()
    chunks = []
    for f in files:
        chunks.extend(
            chunker.chunk_semantic(f.language, f.path.relative_to(corpus),
                                   f.path.read_text(errors="replace"))
        )
    print(f"walked {len(files)} files → {len(chunks)} chunks "
          f"({time.time() - t0:.2f}s) languages={stats.by_language}")

    svc = EmbeddingService("code-hash-384", use_persistent_cache=False)
    t0 = time.time()
    embedded = svc.embed_chunks(chunks)
    print(f"embedded {len(chunks)} chunks in {time.time() - t0:.2f}s "
          f"on {__import__('jax').default_backend()}")

    store = VectorStore(Path(tempfile.mkdtemp()) / "db", dims=svc.dims)
    store.insert_chunks_with_ids(
        np.stack([e.embedding for e in embedded]),
        [ChunkMetadata(path=e.chunk.path, content=e.chunk.content,
                       start_line=e.chunk.start_line, end_line=e.chunk.end_line,
                       kind=e.chunk.kind.value, signature=e.chunk.signature)
         for e in embedded],
    )
    store.build_index()

    for query in ["how are files discovered and filtered",
                  "split oversized chunks with overlap",
                  "cosine similarity top k search"]:
        qv = svc.embed_query(query)
        t0 = time.time()
        res = store.search(qv, 3)
        print(f"\n? {query}  ({1000 * (time.time() - t0):.1f} ms)")
        for r in res:
            print(f"  {r.score:.3f}  {r.metadata.path}:{r.metadata.start_line + 1}"
                  f"  [{r.metadata.kind}]  {(r.metadata.signature or '')[:60]}")
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
