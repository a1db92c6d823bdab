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


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def sharded_cosine_topk(
    queries: jax.Array,   # [Q, d] replicated
    corpus: jax.Array,    # [N, d] sharded over "data"
    valid: jax.Array,     # [N] sharded over "data"
    k: int,
    mesh: Mesh,
) -> tuple[jax.Array, jax.Array]:
    """Exact global top-k. Returns (scores [Q,k], global indices [Q,k])."""
    n_shards = mesh.shape["data"]
    shard_rows = corpus.shape[0] // n_shards

    def local(q, c, v):
        # per-shard scores + local top-k
        scores = jax.lax.dot_general(
            q.astype(c.dtype), c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(v[None, :], scores, _NEG_INF)
        kk = min(k, shard_rows)
        vals, idx = _select_topk(scores, kk)
        my_shard = jax.lax.axis_index("data")
        gidx = idx.astype(jnp.int32) + my_shard * shard_rows
        # gather all shards' candidates and merge (replicated result)
        all_vals = jax.lax.all_gather(vals, "data", axis=0)   # [S, Q, kk]
        all_idx = jax.lax.all_gather(gidx, "data", axis=0)
        s, qn, _ = all_vals.shape
        cat_vals = jnp.transpose(all_vals, (1, 0, 2)).reshape(qn, s * kk)
        cat_idx = jnp.transpose(all_idx, (1, 0, 2)).reshape(qn, s * kk)
        take = min(k, s * kk)
        mvals, mpos = jax.lax.top_k(cat_vals, take)
        midx = jnp.take_along_axis(cat_idx, mpos, axis=1)
        return mvals, midx

    vals, idx = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data", None), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )(queries, corpus, valid)
    return vals, idx
