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
  ~3.1 ms each → first ONE packed int32 table (``slot_meta``), then (r3)
  ZERO per-posting gathers: the kind packs into the posting value itself
  (``slot | kind << SLOT_BITS`` — rides the existing chunk DMA + sort),
  and liveness applies only to the top-``kpre`` candidates (sync-time dead
  postings are dropped at upload; ``slot_meta`` catches post-sync deletes).
- the associative_scan segmented sum (~10 ms) → run totals via shifted
  compare-adds: a (term, dnum) pair is unique within a segment and a dnum's
  postings live in exactly one segment, so a doc slot appears at most once
  per distinct query TERM — run lengths after the sort are bounded by the
  kept-term count (static ``imax``), and ceil(log2(imax)) passes are exact
  regardless of how many segments the store has.

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
SLOT_BITS = 25          # packed posting: slot in low bits, kind above
SLOT_MASK = (1 << SLOT_BITS) - 1
PACK_PAD = (1 << 31) - 1  # padding/dead posting sentinel — sorts last


def _bm25_batch_core(
    p_pos: jax.Array,      # [P] i32 — RESIDENT: posting → slot | kind<<25
    p_w: jax.Array,        # [P] f32 — RESIDENT: (k1+1)·tf/(tf+K) per posting
    slot_meta: jax.Array,  # [N] i32 — RESIDENT: kind id | DEAD_SLOT
    cstart: jax.Array,     # [B, C] i32 — chunk starts into p_pos (pad: 0)
    clen: jax.Array,       # [B, C] i32 — live prefix length ≤ CHUNK (pad: 0)
    cidf: jax.Array,       # [B, C] f32 — per-chunk idf (pad: 0)
    boost_kid: jax.Array,  # [B] i32 — kind id to boost ×3 per query (-1: none)
    k: int,
    kpre: int,             # pre-liveness oversample ≥ k + dead-since-sync
    imax: int,             # static run-length bound (kept query terms)
) -> tuple[jax.Array, jax.Array]:
    """Batched core: chunk DMA-gather → idf apply → per-row sort by packed
    slot → bounded shifted-add run reduction → kind boost from the packed
    high bits → per-row top-k. Only candidate postings are materialized —
    never an [N]-dense vector. Every stage (sort_key_val, the shifted
    compare-adds, top_k, take_along_axis) operates along the last axis, so
    B independent queries ride ONE dispatch — the batched-serving shape
    (search_many) that amortizes the tunnel round trip over the wave.

    The doc kind rides the packed posting value (same doc ⟹ same packed
    key, so runs stay contiguous and the boost costs nothing), replacing a
    per-posting random [N]-table gather that measured 3.8 ms at 524k
    gathered postings — 2/3 of the whole kernel. Liveness (docs deleted
    AFTER their postings synced — sync-time dead postings are already
    dropped at upload) is applied to top-``kpre`` candidates only: the
    caller sizes ``kpre ≥ k + dead-since-sync``, so masked dead candidates
    can never displace k live ones — exact, and when nothing died since
    sync (``kpre == k``) the whole phase compiles away."""
    n = slot_meta.shape[0]
    b, c = cstart.shape
    pos2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_pos, (s,), (CHUNK,))
    )(cstart.reshape(-1)).reshape(b, c, CHUNK)
    w2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_w, (s,), (CHUNK,))
    )(cstart.reshape(-1)).reshape(b, c, CHUNK)
    j = jax.lax.broadcasted_iota(jnp.int32, (b, c, CHUNK), 2)
    live = j < clen[:, :, None]
    pos = jnp.where(live, pos2, PACK_PAD).reshape(b, -1)       # pad sorts last
    w = jnp.where(live, w2 * cidf[:, :, None], 0.0).reshape(b, -1)
    pos_s, w_s = jax.lax.sort_key_val(pos, w)                  # per-row sort
    neq = pos_s[:, 1:] != pos_s[:, :-1]
    is_end = jnp.concatenate([neq, jnp.ones((b, 1), bool)], axis=1)

    # segmented inclusive scan over runs of equal packed pos (Hillis-Steele
    # with power-of-two shifts): run lengths ≤ imax (a slot appears at most
    # once per distinct kept query term), so ceil(log2(imax))
    # carry-propagating passes accumulate each run total exactly at its run
    # end. Runs are contiguous after the sort, so pos_s[i] == pos_s[i-s]
    # implies the whole [i-s, i] span is one run — the carried partial sums
    # never cross a boundary. (The r2 kernel used imax-1 linear passes of
    # the ORIGINAL values; the log form makes big queries 2-3 passes.)
    totals = w_s
    s = 1
    while s < imax:
        same = jnp.concatenate(
            [jnp.zeros((b, s), bool), pos_s[:, s:] == pos_s[:, :-s]], axis=1
        )
        shifted = jnp.concatenate(
            [jnp.zeros((b, s), totals.dtype), totals[:, :-s]], axis=1
        )
        totals = totals + jnp.where(same, shifted, 0.0)
        s *= 2

    kind_s = pos_s >> SLOT_BITS                  # PACK_PAD → 63: never boosts
    slot_s = pos_s & SLOT_MASK
    boost = jnp.where(
        kind_s == boost_kid[:, None], jnp.float32(KIND_BOOST), 1.0
    )
    runs = jnp.where(is_end & (pos_s < PACK_PAD), totals * boost, -jnp.inf)
    kp = min(max(kpre, k), runs.shape[1])
    vals, ridx = jax.lax.top_k(runs, kp)
    cand = jnp.take_along_axis(slot_s, ridx, axis=1).astype(jnp.int32)
    if kp > k:
        # post-sync deletes exist: mask dead candidates (top-kp random
        # gather — a few hundred elements per row, not 524k) and re-rank
        alive = slot_meta[jnp.clip(cand, 0, max(n - 1, 0))] != DEAD_SLOT
        vals = jnp.where(alive, vals, -jnp.inf)
        vals, sel = jax.lax.top_k(vals, min(k, kp))
        cand = jnp.take_along_axis(cand, sel, axis=1)
    return vals, cand


@functools.partial(jax.jit, static_argnames=("k", "kpre", "imax"))
def bm25_resident_topk(
    p_pos: jax.Array,      # [P] i32 — RESIDENT: posting → slot | kind<<25
    p_w: jax.Array,        # [P] f32 — RESIDENT: (k1+1)·tf/(tf+K) per posting
    slot_meta: jax.Array,  # [N] i32 — RESIDENT: kind id | DEAD_SLOT
    cstart: jax.Array,     # [C] i32 — chunk starts into p_pos (pad: 0)
    clen: jax.Array,       # [C] i32 — live prefix length ≤ CHUNK (pad: 0)
    cidf: jax.Array,       # [C] f32 — per-chunk idf (pad: 0)
    boost_kid: jax.Array,  # scalar i32 — kind id to boost ×3 (-1: none)
    k: int,
    kpre: int,             # pre-liveness oversample ≥ k + dead-since-sync
    imax: int,             # static run-length bound (kept query terms)
) -> tuple[jax.Array, jax.Array]:
    """Single-query dispatch: the B=1 slice of ``_bm25_batch_core`` (the
    [1, L] sort/top_k lower identically to the unbatched forms)."""
    vals, cand = _bm25_batch_core(
        p_pos, p_w, slot_meta, cstart[None], clen[None], cidf[None],
        jnp.asarray(boost_kid, jnp.int32)[None], k, kpre, imax,
    )
    return vals[0], cand[0]


@functools.partial(jax.jit, static_argnames=("k", "kpre", "imax"))
def bm25_resident_topk_batch(
    p_pos: jax.Array,
    p_w: jax.Array,
    slot_meta: jax.Array,
    cstart: jax.Array,     # [B, C]
    clen: jax.Array,       # [B, C]
    cidf: jax.Array,       # [B, C]
    boost_kid: jax.Array,  # [B]
    k: int,
    kpre: int,
    imax: int,
) -> tuple[jax.Array, jax.Array]:
    """B independent queries' BM25 top-k in ONE dispatch (search_many)."""
    return _bm25_batch_core(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, k, kpre, imax
    )
