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
