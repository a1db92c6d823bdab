"""Pallas fused cosine-score + threshold-gated top-k kernel.

Motivation (measured on v5e): for [64, 1M] bf16 the XLA path costs ~2.2 ms
matmul + ~2.8 ms flat ``lax.top_k`` over the materialized [Q, N] score
matrix. This kernel streams corpus tiles through VMEM, scores them on the
MXU, and never materializes [Q, N].

Selection design — the TPU grid runs tiles SEQUENTIALLY on one core, so the
kernel keeps a RUNNING top-k in revisited output blocks (resident in VMEM
across grid steps, flushed to HBM once). Selection is *work-proportional*:

- every tile pays the MXU matmul plus ONE per-row max pass;
- a tile enters selection only if some query's tile-max beats that query's
  running k-th best (``@pl.when`` on the reduced flag);
- inside, a dynamic ``lax.while_loop`` extracts one per-row argmax per
  iteration and SORTED-INSERTS it into the running lists, looping only
  while any row still has an improving entry — for random score streams
  that is 1-2 iterations per gated tile, not k fixed rounds (Mosaic lowers
  neither ``top_k`` nor ``sort``, so extraction is hand-rolled max/mask).

Unconditional per-tile k-round extraction (the previous design) measured
19.6 ms at [64, 10M] int8 k=10 — selection was 2/3 of the kernel vs a
6.5 ms matmul-only floor; gating recovers most of that gap. Worst case
(scores ascending across tiles) degrades toward per-tile extraction cost,
never worse than the ungated design.

Exactness: an entry can enter the global top-k only by beating its own
query's current k-th best, which is exactly the admission test — gated-out
tiles/iterations can contain no global top-k member. Equal-score ties keep
XLA ``top_k``'s lowest-index order: earlier tiles insert first and later
equal scores do not displace them (strict ``>`` admission, ``>=`` insert
position).

Dispatched from ops.topk.cosine_topk on TPU for k ≤ MAX_FUSED_K; the XLA
path remains the fallback and the correctness reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -3.0e38  # python float: jnp constants may not be captured by kernels
# With gated selection the per-round cost is O(Q·tile) + O(Q·k) and rounds
# scale with IMPROVING entries (k + k·ln n_tiles total), not k per tile —
# so large-k fusion fetches (the reference retrieves up to max(5·limit, 200)
# candidates, search/mod.rs:490-502) stay on the fused kernel. Measured on
# v5e, [64, 1M] bf16: k=200 costs 3.66 ms (k=10: 1.87) vs 44.1 ms for the
# XLA composition at that k — 12×, with exact (1.0) index overlap.
MAX_FUSED_K = 256
DEFAULT_TILE = 2048


def _select_into_running(scores_scr, j, vals_ref, idx_ref,
                         *, k: int, tile: int):
    """Dynamic extract-and-insert loop over this tile's scores (in VMEM
    scratch). Each iteration takes every row's current max, sorted-inserts
    it where it improves that row's running top-k, masks it, and continues
    only while some row can still improve."""
    nq = vals_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, tile), 1)
    colk = jax.lax.broadcasted_iota(jnp.int32, (nq, k), 1)
    base = (j * tile).astype(jnp.int32)

    def body(_):
        s = scores_scr[:]
        vals = vals_ref[:]
        idxs = idx_ref[:]
        m = jnp.max(s, axis=-1, keepdims=True)                  # [Q, 1]
        arg = jnp.min(jnp.where(s >= m, col, tile), axis=-1)    # [Q]
        ins = m[:, 0] > vals[:, k - 1]                          # [Q]
        gi = arg + base                                         # [Q]
        # sorted insert at the first position with a strictly smaller value
        # (">=" count → new entry lands AFTER equal scores: lowest-index ties)
        pos = jnp.sum((vals >= m).astype(jnp.int32), axis=1)    # [Q]
        shift_v = jnp.concatenate([vals[:, :1], vals[:, :-1]], axis=1)
        shift_i = jnp.concatenate([idxs[:, :1], idxs[:, :-1]], axis=1)
        at = colk == pos[:, None]
        below = colk < pos[:, None]
        new_v = jnp.where(below, vals, jnp.where(at, m, shift_v))
        new_i = jnp.where(below, idxs, jnp.where(at, gi[:, None], shift_i))
        vals_ref[:] = jnp.where(ins[:, None], new_v, vals)
        idx_ref[:] = jnp.where(ins[:, None], new_i, idxs)
        s = jnp.where(col == arg[:, None], _NEG_INF, s)
        scores_scr[:] = s
        nxt = jnp.max(s, axis=-1)                               # [Q]
        return jnp.any(nxt > vals_ref[:, k - 1])

    jax.lax.while_loop(lambda go: go, body, jnp.bool_(True))


def _score_select(scores, j, vals_ref, idx_ref, scores_scr,
                  *, k: int, tile: int):
    """Shared tail: init at j==0, cheap per-row admission gate, gated
    selection. The gate reads the running k-th column directly — no
    separate threshold state."""
    @pl.when(j == 0)
    def _init():
        vals_ref[:] = jnp.full(vals_ref.shape, _NEG_INF, jnp.float32)
        idx_ref[:] = jnp.zeros(idx_ref.shape, jnp.int32)

    row_max = jnp.max(scores, axis=-1)                          # [Q]

    @pl.when(jnp.any(row_max > vals_ref[:, k - 1]))
    def _select():
        scores_scr[:] = scores
        _select_into_running(scores_scr, j, vals_ref, idx_ref,
                             k=k, tile=tile)


def _fused_kernel(q_ref, c_ref, valid_ref, vals_ref, idx_ref,
                  scores_scr, *, k: int, tile: int):
    j = pl.program_id(0)
    q = q_ref[:].astype(jnp.bfloat16)                     # [Q, D]
    scores = jax.lax.dot_general(
        q, c_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # [Q, TILE]
    valid = valid_ref[:].astype(jnp.float32)              # [TILE]
    scores = scores + (1.0 - valid)[None, :] * _NEG_INF
    _score_select(scores, j, vals_ref, idx_ref, scores_scr, k=k, tile=tile)


def _fused_kernel_int8(q_ref, qs_ref, c_ref, rs_ref, valid_ref,
                       vals_ref, idx_ref, scores_scr,
                       *, k: int, tile: int):
    """int8 variant: int8×int8→int32 on the MXU, fp32 rescale per tile."""
    j = pl.program_id(0)
    scores_i32 = jax.lax.dot_general(
        q_ref[:], c_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                     # [Q, TILE]
    q_scale = qs_ref[:]                                   # [Q, 1]
    row_scale = rs_ref[:].astype(jnp.float32)             # [TILE]
    scores = scores_i32.astype(jnp.float32) * q_scale * row_scale[None, :]
    valid = valid_ref[:].astype(jnp.float32)
    scores = scores + (1.0 - valid)[None, :] * _NEG_INF
    _score_select(scores, j, vals_ref, idx_ref, scores_scr, k=k, tile=tile)


def _fused_kernel_scores(s_ref, kid_ref, meta_ref,
                         vals_ref, idx_ref, scores_scr,
                         *, k: int, tile: int, dead_slot: int):
    """Selection-only variant for PRECOMPUTED score rows (the dense BM25
    leg, ops/bm25.py _merge_dense): per-tile kind boost + dead masking,
    then the same gated running top-k as the cosine kernels. The [Q, N]
    scores already exist (they also feed the sparse run-end gather), so
    this kernel replaces a flat ``lax.top_k`` over millions of columns
    with the work-proportional gated selection."""
    j = pl.program_id(0)
    meta = meta_ref[:]                                    # [TILE] i32
    boost = jnp.where(
        meta[None, :] == kid_ref[:], jnp.float32(3.0), jnp.float32(1.0)
    )
    dead = (meta == dead_slot).astype(jnp.float32)        # pads & tombstones
    scores = s_ref[:] * boost + dead[None, :] * _NEG_INF
    _score_select(scores, j, vals_ref, idx_ref, scores_scr, k=k, tile=tile)


@functools.partial(jax.jit, static_argnames=("k", "tile", "dead_slot", "interpret"))
def fused_scores_topk(
    scores: jax.Array,     # [Q, N] f32 — precomputed per-slot scores
    slot_meta: jax.Array,  # [N] i32 — kind id when live, dead_slot otherwise
    boost_kid: jax.Array,  # [Q] i32 — kind id boosted ×3 (-1: none)
    k: int,
    dead_slot: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact boosted top-k over precomputed score rows, streamed tile by
    tile through the gated running-top-k selection."""
    nq, n = scores.shape
    assert n % tile == 0, f"score cols {n} must be a multiple of tile {tile}"
    kk = min(k, tile)
    return pl.pallas_call(
        functools.partial(_fused_kernel_scores, k=kk, tile=tile,
                          dead_slot=dead_slot),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((nq, tile), lambda j: (0, j)),
            pl.BlockSpec((nq, 1), lambda j: (0, 0)),
            pl.BlockSpec((tile,), lambda j: (j,)),
        ],
        out_specs=(
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, kk), jnp.float32),
            jax.ShapeDtypeStruct((nq, kk), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile), jnp.float32)],
        interpret=interpret,
    )(scores, boost_kid.astype(jnp.int32).reshape(nq, 1), slot_meta)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def fused_cosine_topk_int8(
    queries: jax.Array,    # [Q, d] f32
    corpus_q: jax.Array,   # [N, d] int8, N % tile == 0
    row_scale: jax.Array,  # [N] f32
    valid: jax.Array,      # [N] bool
    k: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    n, d = corpus_q.shape
    nq = queries.shape[0]
    assert n % tile == 0
    n_tiles = n // tile
    kk = min(k, tile)
    qf = queries.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-12) / 127.0
    q_i8 = jnp.clip(jnp.round(qf / q_scale), -127, 127).astype(jnp.int8)
    return pl.pallas_call(
        functools.partial(_fused_kernel_int8, k=kk, tile=tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda j: (0, 0)),
            pl.BlockSpec((nq, 1), lambda j: (0, 0)),
            pl.BlockSpec((tile, d), lambda j: (j, 0)),
            pl.BlockSpec((tile,), lambda j: (j,)),
            pl.BlockSpec((tile,), lambda j: (j,)),
        ],
        out_specs=(
            # revisited blocks: the running top-k stays in VMEM for the
            # whole sequential grid, flushed to HBM once at the end
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, kk), jnp.float32),
            jax.ShapeDtypeStruct((nq, kk), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile), jnp.float32)],
        interpret=interpret,
    )(q_i8, q_scale, corpus_q, row_scale, valid)


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def fused_cosine_topk(
    queries: jax.Array,   # [Q, d]
    corpus: jax.Array,    # [N, d] bf16, N % tile == 0 (store pads)
    valid: jax.Array,     # [N] bool
    k: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    n, d = corpus.shape
    nq = queries.shape[0]
    assert n % tile == 0, f"corpus rows {n} must be a multiple of tile {tile}"
    n_tiles = n // tile
    kk = min(k, tile)
    return pl.pallas_call(
        functools.partial(_fused_kernel, k=kk, tile=tile),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda j: (0, 0)),
            pl.BlockSpec((tile, d), lambda j: (j, 0)),
            pl.BlockSpec((tile,), lambda j: (j,)),
        ],
        out_specs=(
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
            pl.BlockSpec((nq, kk), lambda j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, kk), jnp.float32),
            jax.ShapeDtypeStruct((nq, kk), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile), jnp.float32)],
        interpret=interpret,
    )(queries.astype(jnp.bfloat16), corpus, valid)
