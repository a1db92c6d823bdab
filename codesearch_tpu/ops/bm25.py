"""Device BM25: resident postings + chunked slice-gather + run top-k.

Measured on the tunnel-attached chip: shipping even 131k posting entries
host→device costs ~100 ms — per-query posting transfer is unaffordable.
So the postings live in HBM (``p_pos`` dense doc slots + ``p_w`` idf-less
per-posting contributions, precomputed at sync) and a query ships only its
terms' CSR intervals, pre-split on host into ``CHUNK``-aligned slices —
a few hundred bytes.

Per-op cost model (measured on v5e at 262k selected postings):
- elementwise flat gather of (pos, w): 5.7 ms → a vmap'd
  ``dynamic_slice`` over CHUNK-aligned starts: 1.6 ms (XLA lowers it to
  per-chunk DMAs instead of per-element fetches). Chunks never straddle
  interval boundaries (host pads each interval's plan to CHUNK multiples),
  so a chunk is one contiguous DMA with a live-prefix mask.
- per-posting kind + validity lookups were TWO random [N]-table gathers at
  ~3.1 ms each → ONE packed int32 table (``slot_meta``: the kind id for a
  live slot, ``DEAD_SLOT`` otherwise; deletes scatter the sentinel).
- the associative_scan segmented sum (~10 ms) → run totals via shifted
  compare-adds: a doc slot appears at most once per (term × segment) CSR
  interval, so run lengths after the sort are bounded by the ORIGINAL
  interval count (static ``imax``), and ``imax-1`` shifted passes are exact.

Replaces tantivy's per-query segment walk (fts/tantivy_store.rs:394-458)
with the TPU-shaped equivalent of SURVEY §2.1 item 4. Chunk counts are
pow2-bucketed by the caller so XLA compiles O(log) program shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

KIND_BOOST = 3.0
CHUNK = 1024            # slice-gather granularity (measured sweet spot)
DEAD_SLOT = -(1 << 20)  # slot_meta sentinel: tombstoned or padding slot


@functools.partial(jax.jit, static_argnames=("k", "imax"))
def bm25_resident_topk(
    p_pos: jax.Array,      # [P] i32 — RESIDENT: posting → doc slot
    p_w: jax.Array,        # [P] f32 — RESIDENT: (k1+1)·tf/(tf+K) per posting
    slot_meta: jax.Array,  # [N] i32 — RESIDENT: kind id | DEAD_SLOT
    cstart: jax.Array,     # [C] i32 — chunk starts into p_pos (pad: 0)
    clen: jax.Array,       # [C] i32 — live prefix length ≤ CHUNK (pad: 0)
    cidf: jax.Array,       # [C] f32 — per-chunk idf (pad: 0)
    boost_kid: jax.Array,  # scalar i32 — kind id to boost ×3 (-1: none)
    k: int,
    imax: int,             # static bound on original interval count
) -> tuple[jax.Array, jax.Array]:
    """One dispatch: chunk DMA-gather → idf apply → sort by slot → bounded
    shifted-add run reduction → kind boost + liveness mask → top-k. Only
    candidate postings are materialized — never an [N]-dense vector."""
    n = slot_meta.shape[0]
    c = cstart.shape[0]
    pos2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_pos, (s,), (CHUNK,))
    )(cstart)                                                  # [C, CHUNK]
    w2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_w, (s,), (CHUNK,))
    )(cstart)
    j = jax.lax.broadcasted_iota(jnp.int32, (c, CHUNK), 1)
    live = j < clen[:, None]
    pos = jnp.where(live, pos2, n).reshape(-1)                 # n sorts last
    w = jnp.where(live, w2 * cidf[:, None], 0.0).reshape(-1)
    pos_s, w_s = jax.lax.sort_key_val(pos, w)
    neq = pos_s[1:] != pos_s[:-1]
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])

    # segmented inclusive scan over runs of equal pos (Hillis-Steele with
    # power-of-two shifts): run lengths ≤ imax (a slot appears at most once
    # per original interval), so ceil(log2(imax)) carry-propagating passes
    # accumulate each run total exactly at its run end. Runs are contiguous
    # after the sort, so pos_s[i] == pos_s[i-s] implies the whole [i-s, i]
    # span is one run — the carried partial sums never cross a boundary.
    # (The r2 kernel used imax-1 linear passes of the ORIGINAL values; the
    # log form makes 256-interval queries 6 passes instead of 255.)
    totals = w_s
    s = 1
    while s < imax:
        same = jnp.concatenate(
            [jnp.zeros((s,), bool), pos_s[s:] == pos_s[:-s]]
        )
        shifted = jnp.concatenate([jnp.zeros((s,), totals.dtype), totals[:-s]])
        totals = totals + jnp.where(same, shifted, 0.0)
        s *= 2

    meta = slot_meta[jnp.clip(pos_s, 0, max(n - 1, 0))]        # ONE gather
    boost = jnp.where(meta == boost_kid, jnp.float32(KIND_BOOST), 1.0)
    alive = meta != DEAD_SLOT
    runs = jnp.where(is_end & (pos_s < n) & alive, totals * boost, -jnp.inf)
    vals, ridx = jax.lax.top_k(runs, min(k, runs.shape[0]))
    return vals, pos_s[ridx].astype(jnp.int32)
