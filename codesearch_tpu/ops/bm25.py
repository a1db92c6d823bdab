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


@jax.jit
def plane_write_rows(planes, p_pos, p_w, cstart, clen, rows):
    """Build R resident score planes in ONE dispatch (fts/store.py
    _ensure_planes): per-row chunk DMA-gather of each term's postings from
    the resident arrays, scatter-add of the idf-less contributions into
    fresh [R, N] columns, row scatter into the plane buffer. Runs once per
    (prep, device epoch) — queries then read planes via one matmul instead
    of re-gathering millions of postings. Batching matters twice: a cold
    query with T dense terms pays ONE dispatch instead of T, and — because
    the buffer is NOT donated (in-flight queries may still hold the
    previous object; their pw row assignments snapshot that epoch) — one
    functional replacement per prep instead of T transient full-buffer
    copies (at 10M slots a copy is 100s of MB; per-term copies OOM'd the
    r4 bench's cold wave). Padding rows carry ``rows[i] == planes.shape[0]``
    → dropped by the scatter."""
    n = planes.shape[1]
    r, c = cstart.shape
    pos2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_pos, (s,), (CHUNK,))
    )(cstart.reshape(-1)).reshape(r, c, CHUNK)
    w2 = jax.vmap(
        lambda s: jax.lax.dynamic_slice(p_w, (s,), (CHUNK,))
    )(cstart.reshape(-1)).reshape(r, c, CHUNK)
    j = jax.lax.broadcasted_iota(jnp.int32, (r, c, CHUNK), 2)
    livem = j < clen[:, :, None]
    # pads and PACK_PAD postings land out of range → dropped by the scatter
    slots = jnp.where(livem, pos2 & SLOT_MASK, n).reshape(r, -1)
    w = jnp.where(livem, w2, 0.0).reshape(r, -1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, slots.shape, 0)
    cols = jnp.zeros((r, n), jnp.float32).at[ridx, slots].add(w, mode="drop")
    return planes.at[rows].set(cols, mode="drop")


def _dense_scores_topk(combined, slot_meta, boost_kid, kd):
    """Top-kd of the PRECOMPUTED combined dense scores [B, N] (kind boost
    applied, dead slots masked): gated Pallas kernel on TPU when the slot
    count tiles evenly; XLA top_k otherwise (CPU tests, tiny corpora)."""
    from .pallas_topk import DEFAULT_TILE, MAX_FUSED_K, fused_scores_topk

    n = combined.shape[1]
    kd = min(kd, n)
    if (
        jax.default_backend() == "tpu"
        and kd <= MAX_FUSED_K
        and n % DEFAULT_TILE == 0
    ):
        return fused_scores_topk(
            combined, slot_meta, boost_kid, kd, DEAD_SLOT, tile=DEFAULT_TILE
        )
    boost = jnp.where(
        slot_meta[None, :] == boost_kid[:, None], jnp.float32(KIND_BOOST), 1.0
    )
    scores = jnp.where(slot_meta[None, :] == DEAD_SLOT, -jnp.inf,
                       combined * boost)
    vals, idx = jax.lax.top_k(scores, kd)
    return vals, idx.astype(jnp.int32)


# dense-merge sub-batch: bounds the [SUB, N] combined matrix a wave
# materializes at ~SUB×N×4 B regardless of wave size (a 16-query wave over
# a 16.7M-slot corpus would otherwise allocate a 1.07 GB row block on a
# chip already carrying the corpus matrix + resident postings + planes —
# the r4 10M OOM). lax.map reuses the sub-batch buffers across groups.
_MERGE_SUB = 8


def _merge_dense(slot_meta, boost_kid, k, kp, pos_s, totals, is_end, slot_s,
                 kind_s, pw, planes):
    """Planes-enabled selection tail, sub-batched over the query axis (see
    ``_MERGE_SUB``); exactness and candidate-union proof in
    ``_merge_dense_rows``."""
    b = pw.shape[0]
    if b <= _MERGE_SUB or b % _MERGE_SUB:
        # callers pad the batch axis to a pow2 bucket, so b > 8 divides
        # evenly; the remainder guard keeps odd shapes correct regardless
        return _merge_dense_rows(slot_meta, boost_kid, k, kp, pos_s, totals,
                                 is_end, slot_s, kind_s, pw, planes)
    g = b // _MERGE_SUB

    def _sub(args):
        bk, ps, tt, ie, ss, ks, pww = args
        return _merge_dense_rows(slot_meta, bk, k, kp, ps, tt, ie, ss, ks,
                                 pww, planes)

    def _rs(a):
        return a.reshape((g, _MERGE_SUB) + a.shape[1:])

    out_v, out_c = jax.lax.map(
        _sub, (_rs(boost_kid), _rs(pos_s), _rs(totals), _rs(is_end),
               _rs(slot_s), _rs(kind_s), _rs(pw)))
    return (out_v.reshape(b, out_v.shape[-1]),
            out_c.reshape(b, out_c.shape[-1]))


def _merge_dense_rows(slot_meta, boost_kid, k, kp, pos_s, totals, is_end,
                      slot_s, kind_s, pw, planes):
    """Planes-enabled selection tail — EXACT top-k by construction.

    The per-query dense contribution of every doc materializes once as
    ``combined = pw @ planesᵀ`` [B, N] (an MXU matmul over the resident
    plane matrix), then:

    1. every sparse RUN END gets its dense part added (flat gather at the
       run slots — the sparse row only ever carries the query's low-df
       terms, so it is small by routing, fts/store.py device_query_args),
       making the sparse leg's totals the TRUE full scores of every
       sparse-matching doc;
    2. the dense leg takes top-kp of ``combined`` (boosted, dead-masked) —
       every doc with NO sparse match scores exactly its combined value.

    Union of the two candidate lists provably contains the global top-k:
    a doc missing from both lists either matches a sparse term (then ≥ kp
    docs carry full scores ≥ its full score) or is dense-only (then every
    dense-list entry above it is a distinct doc whose true score ≥ its
    dense score). Docs surfaced by both legs keep the sparse copy (full
    score) and mask the dense copy. Dead docs ride the existing
    ``kpre ≥ k + dead-since-sync`` oversample contract."""
    neg = jnp.float32(-3.0e37)
    n = slot_meta.shape[0]
    combined = jax.lax.dot_general(
        pw, planes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [B, N]
    dense_at = jnp.take_along_axis(
        combined, jnp.minimum(slot_s, n - 1), axis=1
    )
    boost = jnp.where(
        kind_s == boost_kid[:, None], jnp.float32(KIND_BOOST), 1.0
    )
    runs = jnp.where(
        is_end & (pos_s < PACK_PAD), (totals + dense_at) * boost, -jnp.inf
    )
    sv, ridx = jax.lax.top_k(runs, kp)                    # full-score leg
    scand = jnp.take_along_axis(slot_s, ridx, axis=1).astype(jnp.int32)
    s_ok = sv > neg
    dv, dcand = _dense_scores_topk(combined, slot_meta, boost_kid, kp)
    cand = jnp.concatenate([scand, dcand], axis=1)
    vals = jnp.concatenate([jnp.where(s_ok, sv, -jnp.inf), dv], axis=1)
    cc = jnp.clip(cand, 0, n - 1)
    live = (slot_meta[cc] != DEAD_SLOT) & (cand < n)
    vals = jnp.where(live, vals, -jnp.inf)
    # dedup: a doc surfaced by BOTH legs keeps the sparse (full-score) copy
    s_sorted = jnp.sort(jnp.where(s_ok, scand, n + 1), axis=1)
    di = jnp.clip(jax.vmap(jnp.searchsorted)(s_sorted, dcand), 0, kp - 1)
    dup = jnp.take_along_axis(s_sorted, di, axis=1) == dcand
    vals = jnp.concatenate(
        [vals[:, :kp], jnp.where(dup, -jnp.inf, vals[:, kp:])], axis=1
    )
    out_v, sel = jax.lax.top_k(vals, min(k, vals.shape[1]))
    out_c = jnp.take_along_axis(cand, sel, axis=1)
    return out_v, out_c


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
    pw: jax.Array | None = None,      # [B, H] f32 — per-plane idf weights
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
):
    """Batched core: chunk DMA-gather → idf apply → per-row sort by packed
    slot → bounded shifted-add run reduction → kind boost from the packed
    high bits → per-row top-k. Without planes only candidate postings are
    materialized — never an [N]-dense vector; the planes path trades one
    [B, N] combined matrix (an MXU matmul over the resident planes, see
    _merge_dense) for keeping every high-df term OUT of the gather+sort.
    Every stage (sort_key_val, the shifted
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
    kp = min(max(kpre, k), totals.shape[1])
    if planes is not None:
        # high-df terms score via resident dense planes (see fts/store.py
        # _ensure_planes): the sparse leg above only ever carries low-df
        # terms, so its sort stays small at any corpus scale
        return _merge_dense(slot_meta, boost_kid, k, kp, pos_s, totals,
                            is_end, slot_s, kind_s, pw, planes)
    boost = jnp.where(
        kind_s == boost_kid[:, None], jnp.float32(KIND_BOOST), 1.0
    )
    runs = jnp.where(is_end & (pos_s < PACK_PAD), totals * boost, -jnp.inf)
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
    pw: jax.Array | None = None,      # [H] f32 — per-plane idf weights
    planes: jax.Array | None = None,  # [H, N] f32 — resident score planes
) -> tuple[jax.Array, jax.Array]:
    """Single-query dispatch: the B=1 slice of ``_bm25_batch_core`` (the
    [1, L] sort/top_k lower identically to the unbatched forms)."""
    vals, cand = _bm25_batch_core(
        p_pos, p_w, slot_meta, cstart[None], clen[None], cidf[None],
        jnp.asarray(boost_kid, jnp.int32)[None], k, kpre, imax,
        pw[None] if pw is not None else None, planes,
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
    pw: jax.Array | None = None,      # [B, H] f32
    planes: jax.Array | None = None,  # [H, N] f32
) -> tuple[jax.Array, jax.Array]:
    """B independent queries' BM25 top-k in ONE dispatch (search_many)."""
    return _bm25_batch_core(
        p_pos, p_w, slot_meta, cstart, clen, cidf, boost_kid, k, kpre, imax,
        pw, planes,
    )
