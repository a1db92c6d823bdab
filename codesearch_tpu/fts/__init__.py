"""Full-text search: BM25 postings store (replaces tantivy)."""

from .store import FtsResult, FtsStore  # noqa: F401
