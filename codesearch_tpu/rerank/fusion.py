"""Reciprocal Rank Fusion (behavioral parity with src/rerank/mod.rs).

score = Σ 1/(k + rank) per ranking list; default k=20, exact-match list
k=5 (stronger boost). Three-way fusion merges vector, BM25, and exact
identifier matches; ``fts_score`` reports (fts+exact)/2 when both present.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_RRF_K = 20.0
EXACT_MATCH_RRF_K = 5.0


@dataclass
class FusedResult:
    chunk_id: int
    rrf_score: float
    vector_score: float | None = None
    fts_score: float | None = None
    vector_rank: int | None = None
    fts_rank: int | None = None


def rrf_fusion(vector_results, fts_results, k: float = DEFAULT_RRF_K) -> list[FusedResult]:
    """vector_results: [(chunk_id, score)], fts_results: [(chunk_id, score)]."""
    acc: dict[int, FusedResult] = {}
    for rank, (cid, score) in enumerate(vector_results):
        e = acc.setdefault(cid, FusedResult(chunk_id=cid, rrf_score=0.0))
        e.rrf_score += 1.0 / (k + rank + 1.0)
        e.vector_score = score
        e.vector_rank = rank + 1
    for rank, (cid, score) in enumerate(fts_results):
        e = acc.setdefault(cid, FusedResult(chunk_id=cid, rrf_score=0.0))
        e.rrf_score += 1.0 / (k + rank + 1.0)
        e.fts_score = score
        e.fts_rank = rank + 1
    return sorted(acc.values(), key=lambda r: -r.rrf_score)


def vector_only(vector_results) -> list[FusedResult]:
    return [
        FusedResult(
            chunk_id=cid,
            rrf_score=score,
            vector_score=score,
            vector_rank=rank + 1,
        )
        for rank, (cid, score) in enumerate(vector_results)
    ]


def rrf_fusion_with_exact(
    vector_results,
    fts_results,
    exact_results,
    vector_k: float = DEFAULT_RRF_K,
    fts_k: float = DEFAULT_RRF_K,
    exact_k: float = EXACT_MATCH_RRF_K,
) -> list[FusedResult]:
    acc: dict[int, dict] = {}

    def entry(cid):
        return acc.setdefault(
            cid,
            {"rrf": 0.0, "v": None, "f": None, "e": None, "vr": None, "fr": None, "er": None},
        )

    for rank, (cid, score) in enumerate(vector_results):
        e = entry(cid)
        e["rrf"] += 1.0 / (vector_k + rank + 1.0)
        e["v"] = score
        e["vr"] = rank + 1
    for rank, (cid, score) in enumerate(fts_results):
        e = entry(cid)
        e["rrf"] += 1.0 / (fts_k + rank + 1.0)
        e["f"] = score
        e["fr"] = rank + 1
    for rank, (cid, score) in enumerate(exact_results):
        e = entry(cid)
        e["rrf"] += 1.0 / (exact_k + rank + 1.0)
        e["e"] = score
        e["er"] = rank + 1

    out = []
    for cid, e in acc.items():
        if e["f"] is not None and e["e"] is not None:
            fts_score = (e["f"] + e["e"]) / 2.0
        else:
            fts_score = e["f"] if e["f"] is not None else e["e"]
        out.append(
            FusedResult(
                chunk_id=cid,
                rrf_score=e["rrf"],
                vector_score=e["v"],
                fts_score=fts_score,
                vector_rank=e["vr"],
                fts_rank=e["fr"] if e["fr"] is not None else e["er"],
            )
        )
    return sorted(out, key=lambda r: -r.rrf_score)
