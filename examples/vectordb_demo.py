"""Vector store demo (reference: examples/vectordb_demo.rs): insert tiny
hand-made embeddings, search, delete, persist, reopen."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny demo; skip TPU init
    from codesearch_tpu.vectordb import ChunkMetadata, VectorStore

    db = Path(tempfile.mkdtemp()) / "demo.db"
    store = VectorStore(db, dims=4)

    def norm(v):
        v = np.asarray(v, np.float32)
        return v / np.linalg.norm(v)

    docs = [
        ("fn parse_config()", [1, 0, 0, 0]),
        ("fn draw_triangle()", [0, 1, 0, 0]),
        ("fn parse_json()", [0.9, 0.1, 0, 0]),
    ]
    ids = store.insert_chunks_with_ids(
        np.stack([norm(v) for _, v in docs]),
        [ChunkMetadata(path=f"f{i}.rs", content=sig, start_line=0, end_line=1,
                       kind="Function", signature=sig)
         for i, (sig, _) in enumerate(docs)],
    )
    store.build_index()
    print("inserted ids:", ids)

    res = store.search(norm([1, 0, 0, 0]), 3)
    print("query ~parse:")
    for r in res:
        print(f"  {r.score:.3f} {r.metadata.signature}")

    store.delete_chunks([ids[0]])
    res = store.search(norm([1, 0, 0, 0]), 3)
    print("after deleting parse_config:")
    for r in res:
        print(f"  {r.score:.3f} {r.metadata.signature}")

    store.save()
    reopened = VectorStore(db, dims=4)
    print(f"reopened: {len(reopened)} chunks, stats={reopened.stats()}")
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
