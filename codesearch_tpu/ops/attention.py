"""Fused multi-head encoder attention (non-causal, padding-masked).

The reference's hot kernel is the ONNX BERT forward on CPU
(embed/embedder.rs:249-295); here the equivalent is a Pallas flash-attention
kernel feeding the MXU: grid over (batch·heads, query blocks), online
softmax accumulation over key blocks, padding handled via additive mask.

For encoder workloads (seq ≤ 512) the XLA-composed path is already close to
roofline, so the Pallas kernel must beat it to earn dispatch; both are kept
and tested for numerical agreement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def reference_attention(
    q: jax.Array,  # [B, H, S, Dh]
    k: jax.Array,  # [B, H, S, Dh]
    v: jax.Array,  # [B, H, S, Dh]
    mask: jax.Array,  # [B, S] 1.0 = valid, 0.0 = pad
    window: int = 0,  # >0: sliding-window attention, |i-j| ≤ window//2
    bias2d: jax.Array | None = None,  # [H, S, S] additive bias (ALiBi)
) -> jax.Array:
    """XLA-composed attention; the correctness reference. ``window`` adds a
    band mask (ModernBERT's local layers, sliding window 128); ``bias2d``
    adds a per-head score bias (ALiBi)."""
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * _NEG_INF
    scores = scores + bias
    if bias2d is not None:
        scores = scores + bias2d[None]
    if window:
        s = q.shape[2]
        idx = jnp.arange(s)
        band = jnp.abs(idx[:, None] - idx[None, :]) <= window // 2
        scores = jnp.where(band[None, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch·head, q-block) program: online softmax over key blocks."""
    q = q_ref[0].astype(jnp.float32) * sm_scale          # [Bq, Dh]
    seq_len = k_ref.shape[1]
    num_kb = seq_len // block_k
    bq = q.shape[0]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        mask_blk = mask_ref[0, 0, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [Bq, Bk]
        s = s + (1.0 - mask_blk)[None, :] * _NEG_INF
        m_cur = jnp.max(s, axis=-1, keepdims=True)       # [Bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                           # [Bq, Bk]
        alpha = jnp.exp(m_prev - m_new)                  # [Bq, 1]
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_new, l_new

    dh = v_ref.shape[-1]
    acc0 = jnp.zeros((bq, dh), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _full_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale: float):
    """One (batch·head) program, whole sequence in VMEM: for encoder
    lengths (S ≤ 1024) the [S, S] score tile fits VMEM, so softmax is
    single-pass and the S² tensor NEVER touches HBM — which is exactly
    what makes the XLA composition HBM-bound at seq 512."""
    q = q_ref[0]                                          # [S, Dh] bf16
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale                                          # [S, S] f32 (VMEM)
    maskb = mask_ref[0, 0].astype(jnp.float32)            # [S]
    s = s + (1.0 - maskb)[None, :] * _NEG_INF
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_attention_full(
    q: jax.Array,  # [B, H, S, Dh]
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,  # [B, S]
    interpret: bool = False,
) -> jax.Array:
    b, h, s, dh = q.shape
    sm_scale = 1.0 / (dh ** 0.5)
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)
    maskf = jnp.repeat(mask, h, axis=0)[:, None, :]
    out = pl.pallas_call(
        functools.partial(_full_kernel, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, dh), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, s, dh)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def pallas_attention(
    q: jax.Array,  # [B, H, S, Dh]
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array,  # [B, S]
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, h, s, dh = q.shape
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, "pad seq to a block multiple"
    sm_scale = 1.0 / (dh ** 0.5)

    # fold batch and heads into the grid's first axis
    qf = q.reshape(b * h, s, dh)
    kf = k.reshape(b * h, s, dh)
    vf = v.reshape(b * h, s, dh)
    # [B*H, 1, S]: trailing-2 dims (1, S) satisfy Mosaic's (8, 128)-divisible
    # -or-full-dim block rule (a [B*H, S] layout with block (1, S) does not)
    maskf = jnp.repeat(mask, h, axis=0)[:, None, :]

    grid = (b * h, s // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        out_shape=jax.ShapeDtypeStruct((b * h, s, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, dh), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, s, dh)


@functools.lru_cache(maxsize=1)
def _default_backend() -> str:
    return jax.default_backend()


def alibi_bias(heads: int, seq: int) -> jax.Array:
    """Symmetric (bidirectional-encoder) ALiBi bias [H, S, S]: -m_h·|i-j|
    with the standard geometric slopes (JinaBERT-v2 / MosaicBERT style)."""
    slopes = 2.0 ** (-8.0 * (jnp.arange(heads, dtype=jnp.float32) + 1.0) / heads)
    idx = jnp.arange(seq)
    dist = jnp.abs(idx[:, None] - idx[None, :]).astype(jnp.float32)
    return -slopes[:, None, None] * dist[None]


def _dispatch_attention(q, k, v, mask) -> jax.Array:
    s = q.shape[2]
    if _default_backend() == "tpu" and s % 128 == 0 and s > 128:
        if s <= 1024:
            # whole-sequence VMEM kernel: at seq 512 the XLA composition
            # spills the [S,S] scores to HBM (measured 1196 → 1509 chunks/s
            # end-to-end on bge-small shapes); ≤128 the scores are small
            # enough that XLA's fusion wins (7.7k vs 4.9k chunks/s)
            return pallas_attention_full(q, k, v, mask)
        return pallas_attention(q, k, v, mask)
    return reference_attention(q, k, v, mask)


@jax.custom_vjp
def _fused_attention(q, k, v, mask):
    return _dispatch_attention(q, k, v, mask)


def _fused_attention_fwd(q, k, v, mask):
    return _dispatch_attention(q, k, v, mask), (q, k, v, mask)


def _fused_attention_bwd(res, g):
    # the Pallas kernels have no autodiff rule — backward recomputes the
    # forward through the XLA reference and differentiates that (standard
    # rematerialized flash-attention backward; training pays one extra
    # forward, inference pays nothing)
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: reference_attention(q_, k_, v_, mask),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(mask)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def fused_encoder_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
    window: int = 0, bias2d: jax.Array | None = None,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU, XLA reference elsewhere. Windowed
    (local) and biased (ALiBi) attention take the XLA path — at encoder
    sequence lengths those score matmuls are already cheap.

    Backend is decided at trace time (jax.default_backend()), never from
    array values — safe under jit. Differentiable everywhere: the Pallas
    forward carries a custom VJP that recomputes through the XLA reference,
    so contrastive/cross-encoder training runs on TPU too.
    """
    if window == 0 and bias2d is None:
        return _fused_attention(q, k, v, mask)
    return reference_attention(q, k, v, mask, window=window, bias2d=bias2d)
