"""Corpus-sharded exact top-k search over a device mesh.

The scaling analog of the reference's single-store ANN (SURVEY.md §2.2): the
[N, d] corpus matrix shards its row dimension across the "data" mesh axis;
queries are replicated. Each shard computes a local exact top-k with the
same fused matmul+selection as the single-chip path, then the k-candidate
lists (k·n_shards rows total — tiny) are all-gathered over ICI and merged.
This is exact: every global top-k member is in its shard's local top-k.

Communication: one all_gather of [Q, k] scores + indices per query batch —
bytes = Q·k·8·n_shards, independent of N.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.topk import _select_topk

_NEG_INF = jnp.float32(-3.0e38)


def shard_corpus(corpus, valid, mesh: Mesh):
    """Place [N, d] corpus + [N] valid mask sharded over the data axis.

    N must be a multiple of the data-axis size (pad with valid=False rows).
    """
    ns = NamedSharding(mesh, P("data", None))
    nv = NamedSharding(mesh, P("data"))
    return jax.device_put(corpus, ns), jax.device_put(valid, nv)


def _gather_merge(vals: jax.Array, idx: jax.Array, k: int, shard_rows: int):
    """all_gather the per-shard [Q, kk] candidates over ICI and merge
    (runs INSIDE shard_map over "data"). Exact: every global top-k member
    is in its shard's local top-k. Bytes moved are independent of N."""
    my_shard = jax.lax.axis_index("data")
    gidx = idx.astype(jnp.int32) + my_shard * shard_rows
    all_vals = jax.lax.all_gather(vals, "data", axis=0)   # [S, Q, kk]
    all_idx = jax.lax.all_gather(gidx, "data", axis=0)
    s, qn, kk = all_vals.shape
    cat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * kk)
    cat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, s * kk)
    take = min(k, s * kk)
    mvals, mpos = jax.lax.top_k(cat_vals, take)
    midx = jnp.take_along_axis(cat_idx, mpos, axis=1)
    return mvals, midx


def _local_scores_bf16(q, c, v):
    scores = jax.lax.dot_general(
        q.astype(c.dtype), c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.where(v[None, :], scores, _NEG_INF)


def _local_scores_int8(q, c_q, scale, v):
    qf = q.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1), 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qf / q_scale[:, None]), -127, 127).astype(jnp.int8)
    scores_i32 = jax.lax.dot_general(
        q_i8, c_q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32,
    )
    scores = scores_i32.astype(jnp.float32) * (q_scale[:, None] * scale[None, :])
    return jnp.where(v[None, :], scores, _NEG_INF)


def _local_topk_bf16(q, c, v, kk: int):
    """Per-shard exact top-k: the gated Pallas kernel on TPU (never
    materializes [Q, shard_rows]) with the XLA composition as fallback —
    the same dispatch rule as ops.topk.cosine_topk, applied per shard."""
    from ..ops.pallas_topk import MAX_FUSED_K, fused_cosine_topk
    from ..ops.topk import _FUSED_TILE, _on_tpu

    n = c.shape[0]
    if (_on_tpu() and kk <= MAX_FUSED_K and q.shape[0] >= 8
            and n % _FUSED_TILE == 0 and c.dtype == jnp.bfloat16):
        return fused_cosine_topk(q, c, v, kk, tile=_FUSED_TILE)
    return _select_topk(_local_scores_bf16(q, c, v), kk)


def _local_topk_int8(q, c_q, scale, v, kk: int):
    from ..ops.pallas_topk import MAX_FUSED_K, fused_cosine_topk_int8
    from ..ops.topk import _FUSED_TILE, _FUSED_TILE_INT8, _on_tpu

    n = c_q.shape[0]
    if _on_tpu() and kk <= MAX_FUSED_K:
        for tile in (_FUSED_TILE_INT8, _FUSED_TILE):
            if n % tile == 0:
                return fused_cosine_topk_int8(q, c_q, scale, v, kk, tile=tile)
    return _select_topk(_local_scores_int8(q, c_q, scale, v), kk)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_cosine_topk(
    queries: jax.Array,   # [Q, d] replicated
    corpus: jax.Array,    # [N, d] sharded over "data"
    valid: jax.Array,     # [N] sharded over "data"
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Exact global top-k. Returns (scores [Q,k], global indices [Q,k])."""
    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(q, c, v):
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_bf16(q, c, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(queries, corpus, valid)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_cosine_topk_int8(
    queries: jax.Array,    # [Q, d] replicated
    corpus_q: jax.Array,   # [N, d] int8, sharded over "data"
    row_scale: jax.Array,  # [N] f32, sharded
    valid: jax.Array,      # [N] bool, sharded
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """int8 variant: the per-shard matmul runs int8×int8→int32 on the MXU."""
    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(q, c, s, v):
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_int8(q, c, s, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(queries, corpus_q, row_scale, valid)


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_hash_embed_search(
    table: jax.Array,     # [V, d] hash table, replicated
    ids: jax.Array,       # [Q, T] feature bucket ids, replicated
    weights: jax.Array,   # [Q, T]
    corpus: jax.Array,    # [N, d] bf16, sharded over "data"
    valid: jax.Array,     # [N] bool, sharded
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Single-dispatch sharded query pipeline: hash-embed the query variants
    (tiny, computed redundantly per shard) + sharded exact top-k, in ONE
    jitted call — the multi-chip analog of ops/query_pipeline.py."""
    from ..models.hash_embedder import embed_features

    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, v):
        q = embed_features(t, i, w)
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_bf16(q, c, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus, valid)


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax", "mesh"))
def sharded_hash_embed_hybrid(
    table: jax.Array,      # [V, d] replicated
    ids: jax.Array,        # [Q, T] replicated
    weights: jax.Array,    # [Q, T]
    corpus: jax.Array,     # [N, d] bf16, sharded over "data"
    valid: jax.Array,      # [N] bool, sharded
    kv: int,
    p_pos: jax.Array,      # FTS resident postings, replicated over the mesh
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip fused hybrid: the sharded vector top-k (local + all_gather
    merge over ICI) and the BM25 interval reduction (computed redundantly on
    replicated resident arrays — cheaper than sharding a few-ms reduction)
    run inside ONE jit, so servers on a pod slice keep the single-dispatch
    read plane of the single-chip path."""
    from ..models.hash_embedder import embed_features
    from ..ops.bm25 import bm25_resident_topk

    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, v):
        q = embed_features(t, i, w)
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_bf16(q, c, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus, valid)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax", "mesh"))
def sharded_hash_embed_hybrid_int8(
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
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from ..ops.bm25 import bm25_resident_topk

    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, s, v):
        q = embed_features(t, i, w)
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_int8(q, c, s, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus_q, row_scale, valid)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "k", "mesh"))
def sharded_bert_embed_search(
    params: dict,         # encoder pytree, replicated
    ids: jax.Array,       # [Q, T] replicated
    mask: jax.Array,      # [Q, T] replicated
    cfg,                  # ArchConfig (static)
    corpus: jax.Array,    # [N, d] bf16, sharded over "data"
    valid: jax.Array,     # [N] bool, sharded
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Multi-chip single-dispatch read plane for BERT-family models: the
    encoder forward runs on replicated inputs (XLA keeps it replicated),
    then the sharded local-topk + all_gather merge consumes the embeddings
    inside the SAME jit — one dispatch end to end."""
    from ..models.encoder import encode

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(qq, c, v):
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_bf16(qq, c, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus, valid)


@functools.partial(jax.jit, static_argnames=("cfg", "k", "mesh"))
def sharded_bert_embed_search_int8(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus_q: jax.Array,
    row_scale: jax.Array,
    valid: jax.Array,
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    from ..models.encoder import encode

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(qq, c, s, v):
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_int8(qq, c, s, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus_q, row_scale, valid)


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax", "mesh"))
def sharded_bert_embed_hybrid(
    params: dict,
    ids: jax.Array,
    mask: jax.Array,
    cfg,
    corpus: jax.Array,
    valid: jax.Array,
    kv: int,
    p_pos: jax.Array,      # FTS resident postings, replicated over the mesh
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,
    kb: int,
    kbpre: int,
    imax: int,
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip fused hybrid for BERT-family backends: encoder forward +
    sharded vector top-k + replicated BM25 reduction in ONE jit (the
    model-agnostic twin of sharded_hash_embed_hybrid)."""
    from ..models.encoder import encode
    from ..ops.bm25 import bm25_resident_topk

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(qq, c, v):
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_bf16(qq, c, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus, valid)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax", "mesh"))
def sharded_bert_embed_hybrid_int8(
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
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.encoder import encode
    from ..ops.bm25 import bm25_resident_topk

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(qq, c, s, v):
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_int8(qq, c, s, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus_q, row_scale, valid)
    b_vals, b_idx = bm25_resident_topk(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_hash_embed_search_int8(
    table: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    corpus_q: jax.Array,
    row_scale: jax.Array,
    valid: jax.Array,
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features

    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, s, v):
        q = embed_features(t, i, w)
        kk = min(k, shard_rows)
        return _gather_merge(*_local_topk_int8(q, c, s, v, kk), k, shard_rows)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus_q, row_scale, valid)


# ---------------------------------------------------------------------------
# Batched serving twins (search_many / DynamicBatcher waves on a mesh): the
# vector plane is already batch-shaped ([Q, ...] rows ride the same shard_map),
# so the only delta vs the single-query hybrids is the batched BM25 kernel —
# every query's interval table stacked into one [B, C] reduction.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax", "mesh"))
def sharded_hash_embed_hybrid_many(
    table: jax.Array,      # [V, d] replicated
    ids: jax.Array,        # [Qtot, T] ALL queries' variants, replicated
    weights: jax.Array,    # [Qtot, T]
    corpus: jax.Array,     # [N, d] bf16, sharded over "data"
    valid: jax.Array,      # [N] bool, sharded
    kv: int,
    p_pos: jax.Array,      # FTS resident postings, replicated over the mesh
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,     # [B, C] per-query interval tables
    clen: jax.Array,       # [B, C]
    cidf: jax.Array,       # [B, C]
    boost_kid: jax.Array,  # [B]
    kb: int,
    kbpre: int,
    imax: int,
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip batched hybrid: a WAVE of B queries through the sharded
    vector top-k (local gated kernel + all_gather merge over ICI) plus the
    batched BM25 reduction (replicated resident arrays) in ONE dispatch."""
    from ..models.hash_embedder import embed_features
    from ..ops.bm25 import bm25_resident_topk_batch

    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, v):
        q = embed_features(t, i, w)
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_bf16(q, c, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus, valid)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("kv", "kb", "kbpre", "imax", "mesh"))
def sharded_hash_embed_hybrid_many_int8(
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
    cstart: jax.Array,     # [B, C]
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,  # [B]
    kb: int,
    kbpre: int,
    imax: int,
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.hash_embedder import embed_features
    from ..ops.bm25 import bm25_resident_topk_batch

    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(t, i, w, c, s, v):
        q = embed_features(t, i, w)
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_int8(q, c, s, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(table, ids, weights, corpus_q, row_scale, valid)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax", "mesh"))
def sharded_bert_embed_hybrid_many(
    params: dict,
    ids: jax.Array,        # [Qtot, T] replicated
    mask: jax.Array,
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
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Multi-chip batched hybrid for BERT-family backends: ONE encoder
    forward over every query's variants + sharded vector top-k + batched
    BM25, all in one dispatch (the model-agnostic twin of
    sharded_hash_embed_hybrid_many)."""
    from ..models.encoder import encode
    from ..ops.bm25 import bm25_resident_topk_batch

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus.shape[0] // mesh.shape["data"]

    def local(qq, c, v):
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_bf16(qq, c, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus, valid)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx


@functools.partial(jax.jit, static_argnames=("cfg", "kv", "kb", "kbpre", "imax", "mesh"))
def sharded_bert_embed_hybrid_many_int8(
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
    cstart: jax.Array,     # [B, C]
    clen: jax.Array,
    cidf: jax.Array,
    boost_kid: jax.Array,  # [B]
    kb: int,
    kbpre: int,
    imax: int,
    mesh: Mesh,
    pw: jax.Array | None = None,      # plane idf weights
    planes: jax.Array | None = None,  # [H, N] resident planes
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    from ..models.encoder import encode
    from ..ops.bm25 import bm25_resident_topk_batch

    q = encode(params, ids, mask, cfg)
    shard_rows = corpus_q.shape[0] // mesh.shape["data"]

    def local(qq, c, s, v):
        kk = min(kv, shard_rows)
        return _gather_merge(*_local_topk_int8(qq, c, s, v, kk), kv, shard_rows)

    v_vals, v_idx = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False,
    )(q, corpus_q, row_scale, valid)
    b_vals, b_idx = bm25_resident_topk_batch(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, kb, kbpre, imax,
        pw=pw, planes=planes,
    )
    return v_vals, v_idx, b_vals, b_idx
