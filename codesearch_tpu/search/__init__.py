"""Query orchestration: analysis, expansion, hybrid retrieval pipeline."""

from .analysis import (  # noqa: F401
    adapt_rrf_k,
    detect_identifiers,
    detect_structural_intent,
    expand_query,
)
from .pipeline import (  # noqa: F401
    SearchHit,
    SearchOptions,
    SearchResponse,
    SearchSession,
    search,
    search_all,
)
