"""Device BM25: resident postings + interval gather + scatter top-k.

Measured on the tunnel-attached chip: shipping even 131k posting entries
host→device costs ~100 ms — per-query posting transfer is unaffordable.
So the postings live in HBM (``p_pos`` dense doc positions + ``p_w``
idf-less per-posting contributions, precomputed at sync), and a query
ships only its terms' CSR *intervals* — [(lo, len, idf)] ≈ a few hundred
bytes. The device gathers each interval (masked fixed-length blocks),
applies idf, scatter-accumulates the dense score vector, boosts the
structural kind, and selects top-k — one dispatch.

Replaces tantivy's per-query segment walk (fts/tantivy_store.rs:394-458)
with the TPU-shaped equivalent of SURVEY §2.1 item 4 (CSR gather +
segmented-sum). Interval counts and block lengths are pow2-bucketed by the
caller so XLA compiles O(log) program shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

KIND_BOOST = 3.0


@functools.partial(jax.jit, static_argnames=("k", "block"))
def bm25_resident_topk(
    p_pos: jax.Array,      # [P] i32 — RESIDENT: posting → dense doc position
    p_w: jax.Array,        # [P] f32 — RESIDENT: (k1+1)·tf/(tf+K) per posting
    kind_ids: jax.Array,   # [N] i32 — RESIDENT: per-doc kind id
    lo: jax.Array,         # [I] i32 — interval starts into p_pos (pad: 0)
    ln: jax.Array,         # [I] i32 — interval lengths (pad: 0)
    idf: jax.Array,        # [I] f32 — per-interval idf (pad: 0)
    boost_kid: jax.Array,  # scalar i32 — kind id to boost ×3 (-1: none)
    k: int,
    block: int,            # static gather length ≥ max(ln), pow2-bucketed
) -> tuple[jax.Array, jax.Array]:
    n = kind_ids.shape[0]
    p = p_pos.shape[0]
    offs = jnp.arange(block, dtype=jnp.int32)                  # [L]
    idx = jnp.clip(lo[:, None] + offs[None, :], 0, p - 1)      # [I, L]
    live = offs[None, :] < ln[:, None]                         # [I, L]
    pos = jnp.where(live, p_pos[idx], n)                       # n → dropped
    w = jnp.where(live, p_w[idx] * idf[:, None], 0.0)
    scores = jnp.zeros((n,), jnp.float32).at[pos.reshape(-1)].add(
        w.reshape(-1), mode="drop"
    )
    boost = jnp.where(kind_ids == boost_kid, jnp.float32(KIND_BOOST), 1.0)
    vals, out_idx = jax.lax.top_k(scores * boost, k)
    return vals, out_idx.astype(jnp.int32)


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
