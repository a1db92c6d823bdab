"""Single-dispatch query pipeline: featurized query → embed → exact top-k.

On remote-attached TPUs each dispatch+readback pays a tunnel round trip
(~38 ms measured here), so the query path composes embedding and retrieval
into ONE jitted call: one host→device transfer of the (tiny) feature
arrays, one device→host transfer of the [V, k] results. On locally
attached chips this simply removes one dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_INF = jnp.float32(-3.0e38)


@functools.partial(jax.jit, static_argnames=("k",))
def hash_embed_search(
    table: jax.Array,     # [V, d] hash-embedder table
    ids: jax.Array,       # [Q, T] feature bucket ids
    weights: jax.Array,   # [Q, T]
    corpus: jax.Array,    # [N, d] bf16
    valid: jax.Array,     # [N] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from .topk import cosine_topk

    q = embed_features(table, ids, weights)         # [Q, d] (nested jit ok)
    return cosine_topk(q, corpus, valid, k)


@functools.partial(jax.jit, static_argnames=("k",))
def hash_embed_search_int8(
    table: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    corpus_q: jax.Array,   # [N, d] int8
    row_scale: jax.Array,  # [N]
    valid: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from .topk import cosine_topk_int8

    q = embed_features(table, ids, weights)
    return cosine_topk_int8(q, corpus_q, row_scale, valid, k)


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax"))
def hash_embed_hybrid_search(
    table: jax.Array,      # [V, d] hash-embedder table
    ids: jax.Array,        # [Q, T] query-variant feature ids
    weights: jax.Array,    # [Q, T]
    corpus: jax.Array,     # [N, d] bf16
    valid: jax.Array,      # [N] bool
    kv: int,               # vector top-k
    p_pos: jax.Array,      # [P] i32 — RESIDENT posting → doc slot
    p_w: jax.Array,        # [P] f32 — RESIDENT idf-less contributions
    slot_meta: jax.Array,  # [M] i32 — FTS packed kind|liveness per slot
    cstart: jax.Array,     # [C] i32 — query chunk starts into p_pos
    clen: jax.Array,       # [C] i32 — live prefix per chunk
    cidf: jax.Array,       # [C] f32 — per-chunk idf
    boost_kid: jax.Array,  # scalar i32 (-1: no boost)
    kb: int,               # BM25 top-k
    kbpre: int,            # BM25 pre-liveness oversample (ops/bm25.py kpre)
    imax: int,             # static run-length bound (kept query terms)
    pw: jax.Array | None = None,      # [H] f32 — plane idf weights
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """THE hybrid query: variant embedding + exact vector top-k + resident-
    postings BM25 top-k fused into ONE dispatch — the host→device transfer
    is just the feature ids + ~10 CSR intervals (hundreds of bytes), one
    device→host readback returns everything the fusion stage needs. On a
    tunnel-attached chip this collapses the 2-3 round trips of
    (embed → search → fts) into a single ~RTT; on local chips it removes
    dispatch overhead. Replaces the reference's sequential
    rayon-ANN-then-tantivy read plane (search/mod.rs:504-691)."""
    from ..models.hash_embedder import embed_features
    from .bm25 import bm25_resident_topk
    from .topk import cosine_topk

    q = embed_features(table, ids, weights)
    v_vals, v_idx = cosine_topk(q, corpus, valid, kv)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax"))
def hash_embed_hybrid_search_many(
    table: jax.Array,      # [V, d] hash-embedder table
    ids: jax.Array,        # [Qtot, T] ALL queries' variant feature ids
    weights: jax.Array,    # [Qtot, T]
    corpus: jax.Array,     # [N, d] bf16
    valid: jax.Array,      # [N] bool
    kv: int,
    p_pos: jax.Array,      # [P] i32 — RESIDENT postings (packed slot|kind)
    p_w: jax.Array,        # [P] f32
    slot_meta: jax.Array,  # [M] i32
    cstart: jax.Array,     # [B, C] i32 — per-query chunk starts
    clen: jax.Array,       # [B, C] i32
    cidf: jax.Array,       # [B, C] f32
    boost_kid: jax.Array,  # [B] i32
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched serving: a WAVE of B queries (their variants concatenated
    along the row axis) through the whole hybrid read plane in ONE
    dispatch — one host→device transfer of all features + interval tables,
    one readback of every query's four result arrays. On a tunnel-attached
    chip this amortizes the ~40 ms round trip over the wave instead of
    paying it per query; the MXU sees one [Qtot, N] matmul instead of B
    small ones. The dynamic-batching shape TPU serving wants (contrast the
    reference's per-query rayon plane, search/mod.rs:504-691)."""
    from ..models.hash_embedder import embed_features
    from .bm25 import bm25_resident_topk_batch
    from .topk import cosine_topk

    q = embed_features(table, ids, weights)
    v_vals, v_idx = cosine_topk(q, corpus, valid, kv)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax"))
def hash_embed_hybrid_search_many_int8(
    table: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    corpus_q: jax.Array,   # [N, d] int8
    row_scale: jax.Array,  # [N]
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from .bm25 import bm25_resident_topk_batch
    from .topk import cosine_topk_int8

    q = embed_features(table, ids, weights)
    v_vals, v_idx = cosine_topk_int8(q, corpus_q, row_scale, valid, kv)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax"))
def bert_embed_hybrid_search_many(
    params: dict,
    ids: jax.Array,        # [Qtot, T] token ids for ALL queries' variants
    mask: jax.Array,       # [Qtot, T]
    cfg,
    corpus: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,     # [B, C]
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,  # [B]
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched serving for BERT-family backends: one encoder forward over
    every query's variants (a [Qtot, T] batch keeps the MXU fed far better
    than B back-to-back [V, T] calls) + batched vector top-k + batched
    BM25, all in ONE dispatch."""
    from ..models.encoder import encode
    from .bm25 import bm25_resident_topk_batch
    from .topk import cosine_topk

    q = encode(params, ids, mask, cfg)
    v_vals, v_idx = cosine_topk(q, corpus, valid, kv)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax"))
def bert_embed_hybrid_search_many_int8(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus_q: jax.Array,
    row_scale: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.encoder import encode
    from .bm25 import bm25_resident_topk_batch
    from .topk import cosine_topk_int8

    q = encode(params, ids, mask, cfg)
    v_vals, v_idx = cosine_topk_int8(q, corpus_q, row_scale, valid, kv)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def bert_embed_search(
    params: dict,          # encoder pytree (replicated)
    ids: jax.Array,        # [Q, T] token ids for the query variants
    mask: jax.Array,       # [Q, T] attention mask
    cfg,                   # ArchConfig (static)
    corpus: jax.Array,     # [N, d] bf16
    valid: jax.Array,      # [N] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Single-dispatch read plane for BERT-family models: the full encoder
    forward (12-layer trunk + pooling + L2 norm) and the exact corpus top-k
    run in ONE jit — same one-RTT discipline as the hash path above, for
    real model weights (model-agnostic parity with search/mod.rs:409-691)."""
    from ..models.encoder import encode
    from .topk import cosine_topk

    q = encode(params, ids, mask, cfg)              # [Q, d] (nested jit ok)
    return cosine_topk(q, corpus, valid, k)


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def bert_embed_search_int8(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus_q: jax.Array,   # [N, d] int8
    row_scale: jax.Array,  # [N]
    valid: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    from ..models.encoder import encode
    from .topk import cosine_topk_int8

    q = encode(params, ids, mask, cfg)
    return cosine_topk_int8(q, corpus_q, row_scale, valid, k)


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax"))
def bert_embed_hybrid_search(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """THE hybrid query for BERT-family backends: encoder forward + exact
    vector top-k + resident-postings BM25 top-k fused into ONE dispatch —
    with real weights the whole read plane still costs one tunnel RTT."""
    from ..models.encoder import encode
    from .bm25 import bm25_resident_topk
    from .topk import cosine_topk

    q = encode(params, ids, mask, cfg)
    v_vals, v_idx = cosine_topk(q, corpus, valid, kv)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax"))
def bert_embed_hybrid_search_int8(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus_q: jax.Array,
    row_scale: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.encoder import encode
    from .bm25 import bm25_resident_topk
    from .topk import cosine_topk_int8

    q = encode(params, ids, mask, cfg)
    v_vals, v_idx = cosine_topk_int8(q, corpus_q, row_scale, valid, kv)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax"))
def hash_embed_hybrid_search_int8(
    table: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    corpus_q: jax.Array,
    row_scale: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    pw: jax.Array | None = None,      # [B, H] f32 (batched) / [H] f32
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from .bm25 import bm25_resident_topk
    from .topk import cosine_topk_int8

    q = embed_features(table, ids, weights)
    v_vals, v_idx = cosine_topk_int8(q, corpus_q, row_scale, valid, kv)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx
