"""Device BM25: resident postings + interval gather + scatter top-k.

Measured on the tunnel-attached chip: shipping even 131k posting entries
host→device costs ~100 ms — per-query posting transfer is unaffordable.
So the postings live in HBM (``p_pos`` dense doc positions + ``p_w``
idf-less per-posting contributions, precomputed at sync), and a query
ships only its terms' CSR *intervals* — [(lo, len, idf)] ≈ a few hundred
bytes. The device gathers the intervals via a flat plan, applies idf, reduces
per-doc runs with a sort + segmented scan, boosts the structural kind,
masks dead slots, and selects top-k — one dispatch.

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


@functools.partial(jax.jit, static_argnames=("k", "ptot"))
def bm25_resident_topk(
    p_pos: jax.Array,      # [P] i32 — RESIDENT: posting → doc slot
    p_w: jax.Array,        # [P] f32 — RESIDENT: (k1+1)·tf/(tf+K) per posting
    kind_ids: jax.Array,   # [N] i32 — RESIDENT: per-slot kind id
    doc_valid: jax.Array,  # [N] bool — RESIDENT: slot liveness (deletes are
                           # a scatter here, never a postings re-upload)
    lo: jax.Array,         # [I] i32 — interval starts into p_pos (pad: 0)
    ln: jax.Array,         # [I] i32 — interval lengths (pad: 0)
    idf: jax.Array,        # [I] f32 — per-interval idf (pad: 0)
    boost_kid: jax.Array,  # scalar i32 — kind id to boost ×3 (-1: none)
    k: int,
    ptot: int,             # static pow2 bucket ≥ total selected postings
) -> tuple[jax.Array, jax.Array]:
    """Sort + segmented-scan accumulation — NO scatter. XLA's TPU scatter
    serializes (~23M updates/s measured: 45 ms for a 1M-posting query);
    sort_key_val + a segmented-sum scan + top_k does the same reduction in
    a few ms, entirely on MXU/VPU-friendly primitives. The gather plan is
    FLAT: slot j maps to its interval via searchsorted over the interval
    cumsum, so work scales with the query's ACTUAL posting count (pow2-
    bucketed once), not intervals × max-interval padding. Only candidate
    docs are materialized — never an [N]-dense vector."""
    n = kind_ids.shape[0]
    p = p_pos.shape[0]
    ends = jnp.cumsum(ln)                                      # [I]
    starts = ends - ln
    total = ends[-1]
    j = jnp.arange(ptot, dtype=jnp.int32)
    iid = jnp.searchsorted(ends, j, side="right").astype(jnp.int32)
    iid = jnp.clip(iid, 0, lo.shape[0] - 1)
    live = j < total
    idx = jnp.clip(lo[iid] + (j - starts[iid]), 0, p - 1)
    pos = jnp.where(live, p_pos[idx], n)                       # n sorts last
    w = jnp.where(live, p_w[idx] * idf[iid], 0.0)
    pos_s, w_s = jax.lax.sort_key_val(pos, w)
    neq = pos_s[1:] != pos_s[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])

    # segmented inclusive-sum scan: runs of equal pos accumulate, flags
    # reset the carry at run starts (exact within each run — no global
    # cumsum cancellation)
    def comb(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    totals, _ = jax.lax.associative_scan(comb, (w_s, is_start))
    boost = jnp.where(
        kind_ids[jnp.clip(pos_s, 0, max(n - 1, 0))] == boost_kid,
        jnp.float32(KIND_BOOST), 1.0,
    )
    alive = doc_valid[jnp.clip(pos_s, 0, max(n - 1, 0))]
    runs = jnp.where(is_end & (pos_s < n) & alive, totals * boost, -jnp.inf)
    vals, ridx = jax.lax.top_k(runs, min(k, runs.shape[0]))
    return vals, pos_s[ridx].astype(jnp.int32)
