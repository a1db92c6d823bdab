"""Device-resident vector store (replaces arroy ANN + LMDB)."""

from .store import ChunkMetadata, SearchResult, StoreStats, VectorStore  # noqa: F401
