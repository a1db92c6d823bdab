"""Shared server-side read plane: ONE implementation of the fused
device dispatch + 3-way RRF fusion + boosts, used by both the MCP service
and the HTTP server (and their warmups), so every serving surface compiles
and runs the exact same executables as the CLI pipeline."""

from __future__ import annotations

from ..rerank import rrf_fusion_with_exact
from ..search.analysis import (
    adapt_rrf_k,
    detect_identifiers,
    detect_structural_intent,
)


def device_candidates(stores, service, query: str, kind: str | None, fetch: int):
    """The fused read plane for one query: embed + vector top-k + BM25
    top-k in ONE device dispatch (same path as the CLI/session pipeline),
    for ANY model family. Returns (vector results, fts results or None).
    Callers hold stores.lock."""
    import numpy as np

    backend = service.backend
    hb = getattr(backend, "model", None)
    if hb is not None and hasattr(hb, "table"):
        fused_kind = "hash"
    elif hasattr(backend, "featurize_queries"):
        fused_kind = "bert"
    else:
        fused_kind = None
    fres = None
    if fused_kind is not None:
        prefixed = [service.spec.query_prefix + query]
        if fused_kind == "hash":
            from ..models.hash_embedder import batch_features

            feats = batch_features(prefixed)
        else:
            feats = backend.featurize_queries(prefixed)
        bm = stores.fts.device_query_args(query, kind, fetch)
        if bm is not None:
            if fused_kind == "hash":
                per_variant, bvv, bii = stores.store.hybrid_search_featurized(
                    hb.table, feats[0], feats[1], fetch, bm
                )
            else:
                per_variant, bvv, bii = stores.store.hybrid_search_encoded(
                    backend.params, backend.cfg, feats[0], feats[1], fetch, bm
                )
            vres = per_variant[0]
            if bvv is not None:
                fres = stores.fts.results_from_device(bvv, bii, fetch)
        elif fused_kind == "hash":
            vres = stores.store.search_featurized(
                hb.table, feats[0], feats[1], fetch
            )[0]
        else:
            vres = stores.store.search_encoded(
                backend.params, backend.cfg, feats[0], feats[1], fetch
            )[0]
    else:
        qvec = service.embed_query(query)
        vres = stores.store.search(np.asarray(qvec), fetch)
    return vres, fres


def ranked_chunks(
    stores,
    service,
    metadata: dict,
    query: str,
    limit: int,
    filter_path: str | None = None,
):
    """Full hybrid ranking for serving surfaces: fused candidates → exact
    identifier matches → adaptive 3-way RRF → language/kind boosts →
    path filter. Returns [(score, chunk_id, ChunkMetadata)] sorted desc,
    truncated to ``limit``. Callers hold stores.lock."""
    intent = detect_structural_intent(query)
    kind = intent.value if intent else None
    vector_k, fts_k = adapt_rrf_k(query)
    vres, fres = device_candidates(stores, service, query, kind, limit * 3)
    if fres is None:
        fres = stores.fts.search(query, limit * 3, boost_kind=kind)
    eres = []
    for ident in detect_identifiers(query):
        eres.extend(stores.fts.search_exact(ident, kind=kind, limit=limit * 3))
    fused = rrf_fusion_with_exact(
        [(r.chunk_id, r.score) for r in vres],
        [(r.chunk_id, r.score) for r in fres],
        [(r.chunk_id, r.score) for r in eres],
        vector_k=vector_k, fts_k=fts_k,
    )
    primary = metadata.get("primary_language")
    scored = []
    for f in fused:
        meta = stores.store.get_chunk(f.chunk_id)
        if meta is None:
            continue
        if filter_path and filter_path not in meta.path:
            continue
        score = f.rrf_score
        if primary and meta.language == primary:
            score *= 1.2
        if kind and meta.kind == kind:
            score *= 1.15
        scored.append((score, f.chunk_id, meta))
    scored.sort(key=lambda x: -x[0])
    return scored[:limit]
