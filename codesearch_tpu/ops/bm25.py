"""Device BM25 accumulation: scatter-add + kind boost + top-k in one jit.

The host assembles the query's posting selection (contiguous CSR range
slices — vectorized numpy, O(P) in the touched postings); the device does
the O(N)-dense work: scatter-accumulate into the score vector, apply the
structural-kind boost, and select top-k — one dispatch, no [N]-sized
host arrays or transfers (only the [P] selection ships).

Replaces tantivy's per-query segment walk (fts/tantivy_store.rs:394-458)
with the TPU-shaped equivalent of SURVEY §2.1 item 4 (CSR gather +
segmented-sum). Shapes are pow2-bucketed by the caller so XLA compiles
O(log P · log N) programs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

KIND_BOOST = 3.0


@functools.partial(jax.jit, static_argnames=("k",))
def bm25_scatter_topk(
    pos: jax.Array,        # [P] i32 — dense-view positions (pad: out-of-range)
    contrib: jax.Array,    # [P] f32 — full per-posting contribution (pad: 0)
    kind_ids: jax.Array,   # [N] i32 — per-doc kind id (device-resident)
    boost_kid: jax.Array,  # scalar i32 — kind id to boost ×3 (-1: none)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    n = kind_ids.shape[0]
    scores = jnp.zeros((n,), jnp.float32).at[pos].add(contrib, mode="drop")
    boost = jnp.where(kind_ids == boost_kid, jnp.float32(KIND_BOOST), 1.0)
    scores = scores * boost
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)
