"""codesearch_tpu — a TPU-native semantic code search framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``codesearch`` system (Rust + ONNX CPU + arroy/LMDB + tantivy): repo walking,
AST-aware chunking, batched on-device embedding, a device-resident vector
store searched by a fused matmul+top-k kernel, hybrid BM25 + RRF retrieval,
cross-encoder reranking, incremental indexing with a filesystem watcher, and
MCP/HTTP serving.

Architecture inversion vs the reference (see SURVEY.md §7): instead of
streaming file-by-file through a CPU model into an on-disk ANN, we batch
aggressively, keep the corpus resident on device, and answer queries with an
exact brute-force cosine top-k (one fused matmul), sharded over the ICI mesh
for large corpora. There is no ANN tree to build: ``build_index`` is O(1).
"""

__version__ = "0.1.0"
