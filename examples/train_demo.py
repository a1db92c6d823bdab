"""Fine-tuning demo: mine pairs from a corpus, train the hash table, and
show before/after retrieval accuracy (see benchmarks/trained_table.md).

Usage: python examples/train_demo.py [corpus_path] [--platform cpu]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--platform" in " ".join(sys.argv) and "cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    corpus = Path(args[0] if args else "codesearch_tpu").resolve()

    from codesearch_tpu.chunker import SemanticChunker
    from codesearch_tpu.embed.service import prepare_text
    from codesearch_tpu.fileio import FileWalker
    from codesearch_tpu.models.hash_embedder import HashEmbedder
    from codesearch_tpu.train.data import mine_pairs
    from codesearch_tpu.train.hash_finetune import finetune_table

    files, _ = FileWalker(corpus).walk()
    chunker = SemanticChunker()
    chunks = []
    for f in files:
        chunks.extend(chunker.chunk_semantic(
            f.language, f.path.relative_to(corpus), f.path.read_text(errors="replace")
        ))
    texts = [prepare_text(c) for c in chunks]
    pairs = mine_pairs(chunks)
    print(f"{len(chunks)} chunks → {len(pairs)} training pairs")

    # held-out evaluation: does a chunk's docstring retrieve its own code?
    eval_pairs = [(c.docstring, i) for i, c in enumerate(chunks)
                  if c.docstring and len(c.docstring) > 20][:50]

    def recall_at_3(table):
        e = HashEmbedder(384)
        e.table = table
        docs = e.embed_texts(texts)
        hits = 0
        for q, target in eval_pairs:
            sims = docs @ e.embed_texts([q])[0]
            hits += target in np.argsort(-sims)[:3]
        return hits / max(len(eval_pairs), 1)

    base = HashEmbedder(384)
    print(f"recall@3 before training: {recall_at_3(base.table):.0%}")
    trained, losses = finetune_table(base.table, pairs, epochs=10)
    print(f"InfoNCE loss {losses[0]:.3f} → {losses[-1]:.3f}")
    print(f"recall@3 after training:  {recall_at_3(trained):.0%}")
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
