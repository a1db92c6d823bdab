"""Embedding layer: device inference backends + three-layer caching."""

from .cache import LruBytesCache, PersistentEmbeddingCache  # noqa: F401
from .service import EmbeddedChunk, EmbeddingService, clean_docstring, prepare_text  # noqa: F401
