"""Neural reranking (behavioral parity with src/rerank/neural.rs).

Cross-encoder scores are sigmoid-normalized and blended 57.5/42.5 with
min-max-normalized RRF scores (neural.rs:12-13, 77-122). All candidate pairs
score in one batched device forward instead of per-pair CPU calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..models.cross_encoder import CrossEncoder
from ..utils.constants import get_global_models_cache_dir

RERANK_WEIGHT = 0.575
RRF_WEIGHT = 0.425


@dataclass
class RerankedResult:
    chunk_id: int
    final_score: float
    rerank_score: float
    rrf_score: float


class NeuralReranker:
    def __init__(self, cross_encoder: CrossEncoder | None = None):
        self.model = cross_encoder or CrossEncoder(get_global_models_cache_dir())

    def rerank(self, query: str, docs: list[tuple[int, str]]) -> list[tuple[int, float]]:
        """(chunk_id, text) pairs → (chunk_id, sigmoid score) sorted desc."""
        if not docs:
            return []
        scores = self.model.score_pairs(query, [t for _, t in docs])
        ranked = sorted(zip((cid for cid, _ in docs), scores), key=lambda x: -x[1])
        return [(cid, float(s)) for cid, s in ranked]

    def rerank_and_blend(
        self,
        query: str,
        docs: list[tuple[int, str]],
        rrf_scores: dict[int, float],
    ) -> list[RerankedResult]:
        """Blend cross-encoder scores with min-max-normalized RRF."""
        if not docs:
            return []
        scores = self.model.score_pairs(query, [t for _, t in docs])
        rrf_vals = np.asarray([rrf_scores.get(cid, 0.0) for cid, _ in docs], np.float64)
        lo, hi = float(rrf_vals.min()), float(rrf_vals.max())
        if hi > lo:
            rrf_norm = (rrf_vals - lo) / (hi - lo)
        else:
            rrf_norm = np.ones_like(rrf_vals)
        out = [
            RerankedResult(
                chunk_id=cid,
                final_score=float(RERANK_WEIGHT * s + RRF_WEIGHT * rn),
                rerank_score=float(s),
                rrf_score=float(rrf_scores.get(cid, 0.0)),
            )
            for (cid, _), s, rn in zip(docs, scores, rrf_norm)
        ]
        out.sort(key=lambda r: -r.final_score)
        return out
