"""Search pipeline — the read plane (parity with src/search/mod.rs:409-1053).

query → batched variant embedding (one device call) → batched multi-variant
exact vector search (one device call; replaces rayon-parallel ANN) → best-
score-per-chunk dedup → early termination to vector-only on a confident
top-5 → hybrid: BM25 + per-identifier exact match + adaptive 3-way RRF →
path filter → primary-language boost ×1.2 → kind boost ×1.15 → optional
neural rerank blend.
"""

from __future__ import annotations

import dataclasses
import time
from collections import OrderedDict
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..embed import EmbeddingService
from ..fts import FtsStore
from ..index.db_discovery import resolve_database_with_message
from ..index.pipeline import read_metadata
from ..rerank import rrf_fusion_with_exact, vector_only
from ..rerank.neural import NeuralReranker
from ..utils.constants import FTS_DIR_NAME
from ..utils.errors import SearchError
from ..utils.logger import get_logger
from ..vectordb import VectorStore
from .analysis import (
    adapt_rrf_k,
    detect_identifiers,
    detect_structural_intent,
    expand_query,
)

log = get_logger("search")


from .degrade import dispatch_with_degrade, is_device_oom as _is_device_oom  # noqa: E402


EARLY_TERMINATION_SCORE = 0.85   # top-5 similarity (ref: distance < 0.15)
LANGUAGE_BOOST = 1.2
KIND_BOOST = 1.15
RESPONSE_CACHE_MAX = 128         # fused responses kept per session


class ResponseCache:
    """Small LRU for fused search responses, keyed on query/options plus
    store mutation counters. Values are stored and returned as copies deep
    enough that caller mutation (rescoring hits, annotating timings,
    appending to context lists) cannot poison the cache. Shared by
    SearchSession and the MCP service."""

    def __init__(self, max_entries: int = RESPONSE_CACHE_MAX):
        self._d: OrderedDict = OrderedDict()
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    @staticmethod
    def _copy(value):
        if isinstance(value, SearchResponse):
            return dataclasses.replace(
                value,
                hits=[dataclasses.replace(h, context=list(h.context))
                      for h in value.hits],
                timings_ms=dict(value.timings_ms),
            )
        if isinstance(value, dict):   # MCP result dicts
            return {**value,
                    "results": [{**r} for r in value.get("results", [])]}
        return value

    def get(self, key):
        v = self._d.get(key)
        if v is None:
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return self._copy(v)

    def clear(self) -> None:
        self._d.clear()

    def put(self, key, value) -> None:
        self._d[key] = self._copy(value)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)

    def __len__(self) -> int:
        return len(self._d)


@dataclass
class SearchOptions:
    limit: int = 10
    mode: str = "hybrid"          # "hybrid" | "vector"
    rerank: bool = False
    path_filter: str | None = None
    min_score: float | None = None
    model: str | None = None
    sync: bool = False
    # parity: the reference auto-creates a missing index (search/mod.rs:413-435)
    create_index: bool = True
    no_expand: bool = False
    rrf_k: float | None = None      # fixed RRF k override (search/mod.rs:640)
    rerank_top: int | None = None   # candidates to rerank (search/mod.rs:712)
    per_file: int | None = None     # max hits per file (search/mod.rs:1007)
    # explicit db location (the global --store flag; skips discovery —
    # the reference declares the flag but never consumes it, cli/mod.rs:71)
    store_path: Path | None = None


@dataclass
class SearchHit:
    chunk_id: int
    score: float
    path: str
    start_line: int
    end_line: int
    kind: str
    signature: str | None
    content: str
    context: list[str] = field(default_factory=list)
    docstring: str | None = None
    language: str | None = None
    vector_score: float | None = None
    fts_score: float | None = None


@dataclass
class SearchResponse:
    hits: list[SearchHit]
    query: str
    mode: str
    total_chunks: int
    timings_ms: dict[str, float] = field(default_factory=dict)
    db_path: str = ""
    # "cross-encoder" | "proxy-bi-encoder" when --rerank ran, else None —
    # degraded (weights-free) reranking must be visible (VERDICT r1 item 6)
    rerank_mode: str | None = None


class SearchSession:
    """Holds open stores + embedding service for repeated queries
    (the reference reopens per CLI call; servers keep this warm)."""

    def __init__(self, db_path: Path, model: str | None = None, readonly: bool = True):
        meta = read_metadata(db_path)
        from ..utils.constants import EMBEDDER_VERSION

        if meta and meta.get("embedder_version", 1) != EMBEDDER_VERSION:
            raise SearchError(
                f"index at {db_path} was built with embedder "
                f"v{meta.get('embedder_version', 1)} (current v{EMBEDDER_VERSION}) "
                "— run `codesearch index --force` to rebuild"
            )
        model_name = model or meta.get("model") or "code-hash-384"
        dims = int(meta.get("dimensions", 384))
        self.db_path = db_path
        self.metadata = meta
        self.service = EmbeddingService(model_name, db_path=db_path)
        if self.service.dims != dims:
            raise SearchError(
                f"model {model_name} has {self.service.dims} dims but index "
                f"was built with {dims}"
            )
        self.store = VectorStore(
            db_path, dims=dims, readonly=readonly,
            int8=bool(meta.get("int8", False)),
        )
        self.fts = FtsStore(db_path / FTS_DIR_NAME, readonly=readonly)
        self.reranker: NeuralReranker | None = None
        # response LRU: on a tunnel-attached chip even the fused single
        # dispatch pays ~1 RTT (~38 ms); agents (the MCP consumer) repeat
        # queries, so cache the whole fused response keyed on the options +
        # store mutation counters (any index change invalidates). Extends the
        # reference's query-embedding cache (embed/cache.rs:142-244 — which
        # we also have) to the full read plane.
        self._resp_cache = ResponseCache()

    @property
    def resp_cache_hits(self) -> int:
        return self._resp_cache.hits

    @property
    def resp_cache_misses(self) -> int:
        return self._resp_cache.misses

    def search(self, query: str, options: SearchOptions | None = None) -> SearchResponse:
        # optional xprof trace (SURVEY §5 tracing parity): set
        # CODESEARCH_PROFILE_DIR to capture a JAX profiler trace per query
        import os

        profile_dir = os.environ.get("CODESEARCH_PROFILE_DIR")
        if profile_dir:
            import jax

            with jax.profiler.trace(profile_dir):
                return self._search_impl(query, options)
        return self._search_impl(query, options)

    def _cache_key(self, query: str, o: SearchOptions) -> tuple:
        return (
            query, o.limit, o.mode, o.rerank, o.path_filter, o.min_score,
            o.no_expand, o.rrf_k, o.rerank_top, o.per_file,
            self.store.mutation_count, self.fts.mutation_count,
        )

    def _search_impl(self, query: str, options: SearchOptions | None = None) -> SearchResponse:
        return dispatch_with_degrade(
            self.fts, lambda: self._search_attempt(query, options), "search"
        )

    def _search_attempt(self, query: str, options: SearchOptions | None = None) -> SearchResponse:
        options = options or SearchOptions()
        if not query or not query.strip():
            raise SearchError("empty query")

        key = self._cache_key(query, options)
        cached = self._resp_cache.get(key)
        if cached is not None:
            cached.timings_ms["cached"] = True
            return cached

        t_all = time.time()
        timings: dict[str, float] = {}

        # ---- plan (shared with the batched serving paths) ---------------
        t = time.time()
        st = self._prep_query(query, options)
        timings["embed"] = (time.time() - t) * 1000
        identifiers, intent = st["identifiers"], st["intent"]
        vector_k, fts_k, fetch = st["vk"], st["fk"], st["fetch"]
        fused_kind, feats, bm_args = st["fused"], st["feats"], st["bm"]
        backend = self.service.backend
        hash_model = getattr(backend, "model", None)
        fused_fts: list | None = None   # BM25 results from the fused dispatch
        exact_prefetched: list | None = None  # exact scans done in-flight
        t = time.time()
        if fused_kind is not None:
            # single-dispatch fast path: featurize/tokenize on host, then
            # embed + vector top-k (+ BM25) in ONE device call — saves 2-3
            # tunnel roundtrips per query, for ANY model family (single
            # chip AND mesh — the sharded variant runs the vector
            # local-topk+merge and the BM25 reduction in one jit)
            raw = None
            if bm_args is not None:
                if fused_kind == "hash":
                    dev_out = self.store.hybrid_search_featurized(
                        hash_model.table, feats[0], feats[1], fetch, bm_args,
                        raw=True, defer=True,
                    )
                else:
                    dev_out = self.store.hybrid_search_encoded(
                        backend.params, backend.cfg, feats[0], feats[1],
                        fetch, bm_args, raw=True, defer=True,
                    )
                # the fused dispatch is in flight — run the host-side
                # exact-identifier scans NOW so their cost (O(df) numpy at
                # high-df identifiers) hides inside the device round trip
                if identifiers and options.mode == "hybrid":
                    exact_prefetched = []
                    for ident in identifiers:
                        exact_prefetched.extend(self.fts.search_exact(
                            ident, kind=intent.value if intent else None,
                            limit=fetch,
                        ))
                # ONE readback for all four result arrays — separate
                # np.asarray() fetches would each pay a tunnel round trip
                import jax

                vv, vi, bv, bi = jax.device_get(dev_out)
                raw = self.store.rows_to_ids(vv, vi)
                fused_fts = self.fts.results_from_device(bv, bi, fetch)
            elif fused_kind == "hash":
                raw = self.store.search_featurized_auto(
                    hash_model, feats[0], feats[1], fetch, raw=True
                )
            else:
                raw = self.store.search_encoded(
                    backend.params, backend.cfg, feats[0], feats[1], fetch,
                    raw=True,
                )
            vector_ranked = self._dedup_raw(raw, fetch)
            meta_of = {}
        else:
            qvecs = np.stack(self.service.embed_queries_batch(st["variants"]))
            per_variant = self.store.search_batch(qvecs, fetch)
            # best score per chunk across variants (search/mod.rs:513-590)
            best: dict[int, float] = {}
            meta_of = {}
            for results in per_variant:
                for r in results:
                    if r.chunk_id not in best or r.score > best[r.chunk_id]:
                        best[r.chunk_id] = r.score
                    meta_of[r.chunk_id] = r.metadata
            vector_ranked = sorted(best.items(), key=lambda kv: -kv[1])[:fetch]
        timings["vector"] = (time.time() - t) * 1000
        resp = self._finish(
            query, options, identifiers, intent, vector_k, fts_k, fetch,
            vector_ranked, meta_of, fused_fts, exact_prefetched, timings, t_all,
        )
        self._resp_cache.put(key, resp)
        return resp

    @staticmethod
    def _dedup_raw(raw, fetch: int) -> list[tuple[int, float]]:
        """Vectorized best-score-per-chunk across variants
        (search/mod.rs:513-590): at the reference's fusion depth (≤9
        variants × 256 candidates) per-result Python objects cost
        milliseconds on one host core — keep it all in numpy."""
        cids, scores = raw
        flat_i = cids.ravel()
        flat_s = scores.ravel().astype(np.float64)
        keep = flat_i >= 0
        flat_i, flat_s = flat_i[keep], flat_s[keep]
        if not flat_i.size:
            return []
        order = np.lexsort((-flat_s, flat_i))
        fi, fs = flat_i[order], flat_s[order]
        first = np.ones(len(fi), bool)
        first[1:] = fi[1:] != fi[:-1]
        bi_, bs_ = fi[first], fs[first]
        top = np.argsort(-bs_, kind="stable")[:fetch]
        return list(zip(bi_[top].tolist(), bs_[top].tolist()))

    def _finish(
        self, query, options, identifiers, intent, vector_k, fts_k, fetch,
        vector_ranked, meta_of, fused_fts, exact_prefetched, timings, t_all,
    ) -> SearchResponse:
        """Post-retrieval stages shared by search() and search_many():
        early termination → fusion → boost-bounded lazy materialization →
        filters → optional rerank → response."""
        # ---- early termination (search/mod.rs:595-621) -------------------
        top5 = [s for _, s in vector_ranked[:5]]
        confident = len(top5) >= 5 and min(top5) > EARLY_TERMINATION_SCORE
        use_hybrid = options.mode == "hybrid" and not confident

        t = time.time()
        if use_hybrid:
            fts_results = fused_fts if fused_fts is not None else self.fts.search(
                query, limit=fetch,
                boost_kind=intent.value if intent else None,
            )
            if exact_prefetched is not None:
                exact_results = exact_prefetched
            else:
                exact_results = []
                for ident in identifiers:
                    exact_results.extend(
                        self.fts.search_exact(
                            ident, kind=intent.value if intent else None,
                            limit=fetch,
                        )
                    )
            fused = rrf_fusion_with_exact(
                vector_ranked,
                [(r.chunk_id, r.score) for r in fts_results],
                [(r.chunk_id, r.score) for r in exact_results],
                vector_k=vector_k, fts_k=fts_k,
            )
        else:
            fused = vector_only(vector_ranked)
        timings["fusion"] = (time.time() - t) * 1000

        # ---- materialize hits (incl. FTS-only chunks), boosts inline -----
        # Metadata reads are lazy preads at corpus scale (vectordb/store.py)
        # — materializing EVERY fused candidate (200-400) costs real ms on
        # one host core. Candidates arrive sorted by rrf_score, and the
        # language ×1.2 / kind ×1.15 boosts (search/mod.rs:789-806, 238-252)
        # can inflate a score at most ×1.38 — so once the `need`-th best
        # boosted score exceeds remaining_rrf × 1.38, no later candidate can
        # enter the result and materialization stops, EXACTLY. Post-filters
        # (path/min-score/per-file) prune after retrieval, so their presence
        # disables the early exit (they need the full pool to refill from).
        import heapq

        primary = self.metadata.get("primary_language")
        boost_cap = LANGUAGE_BOOST * KIND_BOOST
        # quoted spans are hard phrase constraints and -term/-"phrase" are
        # MustNot exclusions (tantivy QueryParser parity): checked at
        # materialization since the index is position-free
        from .analysis import (
            DOC_PATH_PENALTY,
            TEST_PATH_PENALTY,
            compile_operators,
            is_doc_path,
            is_test_path,
            parse_operators,
            passes_operators,
            query_wants_docs,
            query_wants_tests,
        )

        _retr, op_requirements, op_exclusions = parse_operators(query)
        req_matchers, excl_matchers = compile_operators(
            op_requirements, op_exclusions
        )
        wants_tests = query_wants_tests(query)
        wants_docs = query_wants_docs(query)
        has_ops = bool(req_matchers or excl_matchers)
        unbounded = bool(
            options.path_filter or options.min_score is not None
            or (options.per_file or 0) > 0 or has_ops
        )
        if options.rerank:
            need = max(options.rerank_top if options.rerank_top is not None
                       else 0, 100, options.limit)
        else:
            need = options.limit
        top_scores: list[float] = []   # min-heap of the best `need` scores
        hits: list[SearchHit] = []
        for f in fused:
            if (
                not unbounded
                and len(top_scores) >= need
                and f.rrf_score * boost_cap < top_scores[0]
            ):
                break
            meta = meta_of.get(f.chunk_id) or self.store.get_chunk(f.chunk_id)
            if meta is None:
                continue
            if has_ops and not passes_operators(
                meta.content, req_matchers, excl_matchers
            ):
                continue
            score = f.rrf_score
            if primary and meta.language == primary:
                score *= LANGUAGE_BOOST
            if intent is not None and meta.kind == intent.value:
                score *= KIND_BOOST
            if not wants_tests and is_test_path(meta.path):
                score *= TEST_PATH_PENALTY
            if not wants_docs and is_doc_path(meta.path):
                score *= DOC_PATH_PENALTY
            hits.append(
                SearchHit(
                    chunk_id=f.chunk_id,
                    score=score,
                    path=meta.path,
                    start_line=meta.start_line,
                    end_line=meta.end_line,
                    kind=meta.kind,
                    signature=meta.signature,
                    content=meta.content,
                    context=meta.context,
                    docstring=meta.docstring,
                    language=meta.language,
                    vector_score=f.vector_score,
                    fts_score=f.fts_score,
                )
            )
            if len(top_scores) < need:
                heapq.heappush(top_scores, score)
            elif score > top_scores[0]:
                heapq.heapreplace(top_scores, score)

        # ---- path filter (pre-rerank, search/mod.rs:698-745) -------------
        if options.path_filter:
            needle = options.path_filter
            hits = [h for h in hits if needle in h.path]

        hits.sort(key=lambda h: -h.score)

        # ---- neural rerank blend (search/mod.rs:829-866) -----------------
        rerank_mode: str | None = None
        if options.rerank and hits:
            t = time.time()
            if self.reranker is None:
                self.reranker = NeuralReranker()
            rerank_mode = self.reranker.model.mode
            n_rerank = (max(options.rerank_top, 0)
                        if options.rerank_top is not None
                        else max(100, options.limit))
            cands = hits[:n_rerank]
            reranked = self.reranker.rerank_and_blend(
                query,
                [(h.chunk_id, h.signature or h.content[:512]) for h in cands],
                {h.chunk_id: h.score for h in cands},
            )
            order = {r.chunk_id: (i, r.final_score) for i, r in enumerate(reranked)}
            cands.sort(key=lambda h: order.get(h.chunk_id, (len(order), 0.0))[0])
            for h in cands:
                if h.chunk_id in order:
                    h.score = order[h.chunk_id][1]
            hits = cands + hits[len(cands):]
            timings["rerank"] = (time.time() - t) * 1000
            # path filter re-applied post-rerank (search/mod.rs:869-882)
            if options.path_filter:
                needle = options.path_filter
                hits = [h for h in hits if needle in h.path]

        if options.min_score is not None:
            hits = [h for h in hits if h.score >= options.min_score]
        if options.per_file is not None and options.per_file > 0:
            seen_per_file: dict[str, int] = {}
            capped = []
            for h in hits:
                c = seen_per_file.get(h.path, 0)
                if c < options.per_file:
                    capped.append(h)
                    seen_per_file[h.path] = c + 1
            hits = capped
        hits = hits[: options.limit]
        timings["total"] = (time.time() - t_all) * 1000
        return SearchResponse(
            hits=hits,
            query=query,
            mode="vector" if not use_hybrid else "hybrid",
            total_chunks=len(self.store),
            timings_ms=timings,
            db_path=str(self.db_path),
            rerank_mode=rerank_mode,
        )

    def _fused_kind(self) -> str | None:
        return self.service.fused_kind()

    def _prep_query(self, query: str, options: SearchOptions) -> dict:
        """Host-side per-query planning — ONE implementation shared by
        search() and the batched serving paths (their result equivalence
        is a tested invariant, so the plan must not fork): analysis,
        adaptive retrieval depth, variant expansion, featurization, BM25
        interval tables.

        Retrieval-depth rule (search/mod.rs:490-502): semantic queries
        need a deep candidate pool for good RRF fusion; identifier queries
        lean on exact matching; vector-only keeps 3× headroom because
        path/min-score/per-file filters prune AFTER retrieval."""
        if not query or not query.strip():
            raise SearchError("empty query")
        # operator syntax parses ONCE: retrieval runs on the stripped text
        # (an excluded term must not attract the candidates it rejects;
        # phrase quotes are transparent to the embedders), the constraints
        # filter at materialization (_finish)
        from .analysis import parse_operators

        retrieval, phrases, exclusions = parse_operators(query)
        retrieval = retrieval or query
        identifiers = detect_identifiers(retrieval)
        intent = detect_structural_intent(retrieval)
        if options.rrf_k is not None:
            vector_k = fts_k = float(options.rrf_k)
        else:
            vector_k, fts_k = adapt_rrf_k(retrieval)
        variants = [retrieval] if options.no_expand else expand_query(retrieval)
        if options.mode == "vector":
            fetch = options.limit * 3
        elif identifiers:
            fetch = max(options.limit * 3, 100)
        else:
            fetch = max(options.limit * 5, 200)
        if phrases or exclusions:
            # hard content filters prune AFTER retrieval: deepen the pool
            # so a rare phrase whose terms are common can still surface
            fetch = max(fetch, 500)
        fused = self._fused_kind()
        feats = None
        bm_args = None
        if fused is not None:
            prefixed = [self.service.spec.query_prefix + v for v in variants]
            if fused == "hash":
                from ..models.hash_embedder import batch_features

                feats = batch_features(prefixed)
            else:
                feats = self.service.backend.featurize_queries(prefixed)
            if options.mode == "hybrid":
                bm_args = self.fts.device_query_args(
                    query, intent.value if intent else None, fetch
                )
        # Note the small-corpus host fast path: when the BM25 leg routes to
        # host (bm_args None — device floor or vector-only mode) and the
        # corpus is under the host threshold, the hash-model vector leg
        # scores in numpy too (store.search_featurized_auto) — the whole
        # query then runs with zero device dispatches (a one-shot CLI
        # process saves >1 s of trace/load).
        return {
            "query": query, "identifiers": identifiers, "intent": intent,
            "vk": vector_k, "fk": fts_k, "fetch": fetch, "feats": feats,
            "bm": bm_args, "fused": fused, "variants": variants,
        }

    def search_many(
        self, queries: list[str], options: SearchOptions | None = None
    ) -> list[SearchResponse]:
        """Batched serving path: the whole WAVE of queries rides ONE fused
        device dispatch — every query's variants concatenated into a single
        [Qtot, T] embed+top-k batch, every query's BM25 interval table
        stacked into one [B, C] batched kernel call — then one readback for
        the wave. Wall time ≈ one tunnel round trip + one (well-fed) kernel
        instead of N round trips; host-side exact-identifier scans overlap
        the in-flight dispatch. Semantics identical to per-query search()
        (each query's results are trimmed to its own retrieval depth).
        On a corpus mesh the wave rides the sharded batched twins
        (parallel/sharded_search.py *_many). Falls back to sequential
        search() for configurations batching does not cover (non-fused
        backends, rerank)."""
        # same HBM-pressure degrade as search(): the batched-wave
        # executable is the largest-workspace shape in the process, so
        # it is the likeliest victim when score planes crowd HBM
        return dispatch_with_degrade(
            self.fts,
            lambda: self._search_many_attempt(queries, options),
            "batched search",
        )

    def _search_many_attempt(
        self, queries: list[str], options: SearchOptions | None = None
    ) -> list[SearchResponse]:
        options = options or SearchOptions()
        fused_kind = self._fused_kind()
        if fused_kind is None or options.rerank:
            return [self.search(q, options) for q in queries]

        t_all = time.time()
        pending: list[dict | None] = []
        out: list[SearchResponse | None] = [None] * len(queries)
        for qi, query in enumerate(queries):
            if not query or not query.strip():
                raise SearchError("empty query")
            key = self._cache_key(query, options)
            cached = self._resp_cache.get(key)
            if cached is not None:
                cached.timings_ms["cached"] = True
                out[qi] = cached
                pending.append(None)
                continue
            st = self._prep_query(query, options)
            st["key"] = key
            pending.append(st)
        live = [st for st in pending if st is not None]
        if not live:
            return out  # type: ignore[return-value]

        # ---- assemble ONE dispatch for the whole wave -------------------
        import jax

        tmax = max(st["feats"][0].shape[1] for st in live)
        qtot = sum(st["feats"][0].shape[0] for st in live)
        qpad = max(8, 1 << (qtot - 1).bit_length())   # pow2 row bucket
        ids_all = np.zeros((qpad, tmax), np.int32)
        aux_all = np.zeros(
            (qpad, tmax),
            np.float32 if fused_kind == "hash" else np.int32,
        )
        row = 0
        for st in live:
            f_ids, f_aux = st["feats"]
            v, t = f_ids.shape
            ids_all[row:row + v, :t] = f_ids
            aux_all[row:row + v, :t] = f_aux
            st["rows"] = (row, row + v)
            row += v
        # pad rows repeat the first real variant (zero-token rows would
        # push an empty attention mask through the encoder); their results
        # are never read back per-query
        if row < qpad:
            ids_all[row:] = ids_all[0]
            aux_all[row:] = aux_all[0]
        kvmax = max(st["fetch"] for st in live)
        hyb = [st for st in live if st["bm"] is not None]
        for hi, st in enumerate(hyb):
            st["hi"] = hi
        backend = self.service.backend
        hash_model = getattr(backend, "model", None)
        dev_out = None
        raw_all = None
        if hyb:
            from ..fts.store import stack_query_args

            try:
                bm_batch = stack_query_args([st["bm"] for st in hyb])
            except ValueError:
                # epoch moved between preps. Two causes: a COLD wave whose
                # preps each built a score plane (every build replaces the
                # buffer object), or a writer re-syncing the resident
                # postings. Re-prep once — plane builds are now cached, so
                # a stable epoch means this succeeds — else go sequential.
                try:
                    for st in hyb:
                        st["bm"] = self.fts.device_query_args(
                            st["query"],
                            st["intent"].value if st["intent"] else None,
                            st["fetch"],
                        )
                    if any(st["bm"] is None for st in hyb):
                        raise ValueError("bm leg rerouted between preps")
                    bm_batch = stack_query_args([st["bm"] for st in hyb])
                except ValueError:
                    return self._search_many_waves(queries, options)
            if fused_kind == "hash":
                dev_out = self.store.hybrid_search_featurized_many(
                    hash_model.table, ids_all, aux_all, kvmax, bm_batch,
                )
            else:
                dev_out = self.store.hybrid_search_encoded_many(
                    backend.params, backend.cfg, ids_all, aux_all, kvmax,
                    bm_batch,
                )
            if dev_out is None:   # store emptied under us
                return self._search_many_waves(queries, options)
        elif fused_kind == "hash":
            # search_featurized_auto routes a no-BM25 wave over a small
            # corpus to host numpy, mirroring the per-query routing (result
            # equivalence between search() and search_many() is a tested
            # invariant)
            raw_all = self.store.search_featurized_auto(
                hash_model, ids_all, aux_all, kvmax, raw=True
            )
        else:
            raw_all = self.store.search_encoded(
                backend.params, backend.cfg, ids_all, aux_all, kvmax, raw=True
            )
        # dispatch is in flight — run every host-side exact-identifier scan
        # now so its cost hides inside the device round trip
        for st in hyb:
            if not st["identifiers"]:
                continue
            kind = st["intent"].value if st["intent"] else None
            exact = []
            for ident in st["identifiers"]:
                exact.extend(self.fts.search_exact(ident, kind=kind,
                                                   limit=st["fetch"]))
            st["exact"] = exact
        bv = bi = None
        if dev_out is not None:
            vv, vi, bv, bi = jax.device_get(dev_out)
            raw_all = self.store.rows_to_ids(vv, vi)
        cids_all, scores_all = raw_all
        for qi, st in enumerate(pending):
            if st is None:
                continue
            rs, re_ = st["rows"]
            fq = st["fetch"]
            # trim each query's rows to ITS OWN retrieval depth — results
            # must equal per-query search() exactly (candidates are sorted
            # descending, so the [:fq] prefix IS that query's top-fq)
            raw_q = (cids_all[rs:re_, :fq], scores_all[rs:re_, :fq])
            vector_ranked = self._dedup_raw(raw_q, fq)
            fused_fts = None
            if st["bm"] is not None:
                fused_fts = self.fts.results_from_device(
                    bv[st["hi"]], bi[st["hi"]], fq
                )
            timings: dict[str, float] = {}
            resp = self._finish(
                st["query"], options, st["identifiers"], st["intent"],
                st["vk"], st["fk"], fq, vector_ranked, {},
                fused_fts, st.get("exact"), timings, t_all,
            )
            self._resp_cache.put(st["key"], resp)
            out[qi] = resp
        return out  # type: ignore[return-value]

    def _search_many_waves(
        self, queries: list[str], options: SearchOptions | None = None
    ) -> list[SearchResponse]:
        """Per-query dispatch waves: every query's fused kernel enqueued
        back-to-back (async), host exact scans overlapped, ONE readback
        wait for all. The fallback when the single-dispatch wave cannot
        run (store emptied mid-flight). Wall time ≈ one round trip +
        Σ(device time) instead of N full round trips."""
        options = options or SearchOptions()
        backend = self.service.backend
        hash_model = getattr(backend, "model", None)
        fused_kind = None
        if hash_model is not None and hasattr(hash_model, "table"):
            fused_kind = "hash"
        elif hasattr(backend, "featurize_queries"):
            fused_kind = "bert"
        if fused_kind is None or options.rerank:
            return [self.search(q, options) for q in queries]

        t_all = time.time()
        pending: list[dict | None] = []
        out: list[SearchResponse | None] = [None] * len(queries)
        for qi, query in enumerate(queries):
            if not query or not query.strip():
                raise SearchError("empty query")
            key = self._cache_key(query, options)
            cached = self._resp_cache.get(key)
            if cached is not None:
                cached.timings_ms["cached"] = True
                out[qi] = cached
                pending.append(None)
                continue
            # ONE planning implementation (_prep_query) — operator
            # stripping, adaptive depth, variant expansion and the BM25
            # interval table must not fork from search()'s
            st = self._prep_query(query, options)
            feats, bm_args, fetch = st["feats"], st["bm"], st["fetch"]
            if bm_args is not None:
                if fused_kind == "hash":
                    dev_out = self.store.hybrid_search_featurized(
                        hash_model.table, feats[0], feats[1], fetch, bm_args,
                        raw=True, defer=True,
                    )
                else:
                    dev_out = self.store.hybrid_search_encoded(
                        backend.params, backend.cfg, feats[0], feats[1],
                        fetch, bm_args, raw=True, defer=True,
                    )
            elif fused_kind == "hash":
                # routed: small corpora score on host (result-equivalent
                # to search()'s routing by construction)
                dev_out = self.store.search_featurized_auto(
                    hash_model, feats[0], feats[1], fetch, raw=True
                )
            else:
                dev_out = self.store.search_encoded(
                    backend.params, backend.cfg, feats[0], feats[1], fetch,
                    raw=True,
                )
            st.update(key=key, dev=dev_out, hybrid=bm_args is not None)
            pending.append(st)
        # all dispatches enqueued — do every host-side exact scan now
        for st in pending:
            if st is None or not st["hybrid"] or not st["identifiers"]:
                continue
            kind = st["intent"].value if st["intent"] else None
            exact = []
            for ident in st["identifiers"]:
                exact.extend(self.fts.search_exact(ident, kind=kind,
                                                   limit=st["fetch"]))
            st["exact"] = exact
        # ONE blocking readback wave for every query's arrays — a per-query
        # device_get loop would serialize N tunnel round trips and forfeit
        # the batching win
        import jax

        waves = [st["dev"] for st in pending if st is not None and st["hybrid"]]
        fetched = iter(jax.device_get(waves))
        for st in pending:
            if st is not None and st["hybrid"]:
                st["dev"] = next(fetched)
        for qi, st in enumerate(pending):
            if st is None:
                continue
            timings: dict[str, float] = {}
            if st["hybrid"]:
                vv, vi, bv, bi = st["dev"]
                raw = self.store.rows_to_ids(vv, vi)
                fused_fts = self.fts.results_from_device(bv, bi, st["fetch"])
            else:
                raw = st["dev"]
                fused_fts = None
            vector_ranked = self._dedup_raw(raw, st["fetch"])
            resp = self._finish(
                st["query"], options, st["identifiers"], st["intent"],
                st["vk"], st["fk"], st["fetch"], vector_ranked, {},
                fused_fts, st.get("exact"), timings, t_all,
            )
            self._resp_cache.put(st["key"], resp)
            out[qi] = resp
        return out  # type: ignore[return-value]


def search(
    query: str,
    path: str | Path = ".",
    options: SearchOptions | None = None,
) -> SearchResponse:
    """One-shot CLI search: resolve db (optionally auto-create/sync), query."""
    options = options or SearchOptions()
    if options.store_path is not None:
        db = Path(options.store_path)
        if not (db / "metadata.json").exists():
            raise SearchError(f"--store {db} is not a codesearch database")
        session = SearchSession(db, model=options.model, readonly=True)
        return session.search(query, options)
    db, message = resolve_database_with_message(Path(path))
    if db is None:
        if options.create_index:
            from ..index.pipeline import IndexOptions, index

            stats = index(path, IndexOptions(model=options.model or "code-hash-384"))
            db = stats.db_path
        else:
            raise SearchError(message)
    elif options.sync:
        from ..index.pipeline import index_quiet

        index_quiet(path)
    session = SearchSession(db, model=options.model, readonly=True)
    return session.search(query, options)


def search_all(
    query: str,
    path: str | Path = ".",
    options: SearchOptions | None = None,
) -> list[tuple[str, "SearchResponse | Exception"]]:
    """Federated search: the same query against EVERY index discoverable
    from ``path`` (cwd/children/parents + the global registry — the same
    set `codesearch list` and the MCP find_databases tool report). Results
    stay grouped per database: RRF scores are query-relative and
    comparable within one corpus, so interleaving repos by score would be
    meaningless. A database that fails to open (stale embedder version,
    corruption) contributes its exception instead of aborting the rest."""
    from ..index.db_discovery import find_databases

    options = options or SearchOptions()
    out: list[tuple[str, SearchResponse | Exception]] = []
    for db in find_databases(Path(path)):
        try:
            session = SearchSession(db, readonly=True)
            out.append((str(db), session.search(query, options)))
        except Exception as e:  # per-db isolation
            out.append((str(db), e))
    return out
