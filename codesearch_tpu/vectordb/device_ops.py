"""Incremental device-matrix update ops.

The corpus lives in HBM as a pre-allocated ``[capacity, d]`` matrix plus a
``[capacity]`` validity mask. Inserts are staged ``dynamic_update_slice``
writes into donated buffers (no full re-upload — the analog of the
reference's incremental LMDB insert txns, vectordb/store.rs:618-651);
deletes are a scatter of False into the mask. Update blocks are padded to
power-of-two row counts so XLA compiles only O(log n) program shapes, and
``base`` is a traced scalar so writes at any offset share one program.

Donation rules: buffers are donated on TPU (in-place HBM update, no 2×
transient); on CPU donation is unimplemented in XLA, so we skip it there to
avoid warning spam.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pow2(n: int) -> int:
    """Smallest power of two ≥ n (≥ 1)."""
    return 1 << max(0, (int(n) - 1).bit_length())


@functools.lru_cache(maxsize=None)
def _donate() -> bool:
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _insert_rows_fn():
    def f(mat, valid, block, vblock, base):
        mat = jax.lax.dynamic_update_slice(mat, block.astype(mat.dtype), (base, 0))
        valid = jax.lax.dynamic_update_slice(valid, vblock, (base,))
        return mat, valid

    donate = (0, 1) if _donate() else ()
    return jax.jit(f, donate_argnums=donate)


@functools.lru_cache(maxsize=None)
def _insert_rows_int8_fn():
    def f(mat, scale, valid, qblock, sblock, vblock, base):
        mat = jax.lax.dynamic_update_slice(mat, qblock, (base, 0))
        scale = jax.lax.dynamic_update_slice(scale, sblock, (base,))
        valid = jax.lax.dynamic_update_slice(valid, vblock, (base,))
        return mat, scale, valid

    donate = (0, 1, 2) if _donate() else ()
    return jax.jit(f, donate_argnums=donate)


@functools.lru_cache(maxsize=None)
def _invalidate_fn():
    def f(valid, idx):
        # out-of-range pad indices (== capacity) drop instead of clamping
        return valid.at[idx].set(False, mode="drop")

    donate = (0,) if _donate() else ()
    return jax.jit(f, donate_argnums=donate)


def insert_rows(mat, valid, rows_f32: np.ndarray, valid_rows: np.ndarray, base: int):
    """Write ``rows_f32`` (+ their validity bits) at row ``base``.

    Pads the block to a power-of-two row count; the padding lands on unused
    capacity rows (caller guarantees ``base + pow2(n) <= capacity``) and is
    marked invalid.
    """
    n = rows_f32.shape[0]
    npad = pow2(n)
    block = np.zeros((npad, rows_f32.shape[1]), np.float32)
    block[:n] = rows_f32
    vblock = np.zeros(npad, bool)
    vblock[:n] = valid_rows
    return _insert_rows_fn()(
        mat, valid, jnp.asarray(block, mat.dtype), jnp.asarray(vblock),
        jnp.int32(base),
    )


def insert_rows_int8(
    mat, scale, valid, rows_f32: np.ndarray, valid_rows: np.ndarray, base: int
):
    """int8 variant: quantizes the new rows on host (tiny) and writes
    quantized rows + per-row scales + validity in one donated device call."""
    n = rows_f32.shape[0]
    npad = pow2(n)
    block = np.zeros((npad, rows_f32.shape[1]), np.float32)
    block[:n] = rows_f32
    absmax = np.abs(block).max(axis=1)
    s = np.maximum(absmax, 1e-12) / 127.0
    q = np.clip(np.round(block / s[:, None]), -127, 127).astype(np.int8)
    vblock = np.zeros(npad, bool)
    vblock[:n] = valid_rows
    return _insert_rows_int8_fn()(
        mat, scale, valid,
        jnp.asarray(q), jnp.asarray(s, jnp.float32), jnp.asarray(vblock),
        jnp.int32(base),
    )


@functools.lru_cache(maxsize=None)
def _update_1d_fn():
    def f(arr, block, base):
        return jax.lax.dynamic_update_slice(arr, block, (base,))

    donate = (0,) if _donate() else ()
    return jax.jit(f, donate_argnums=donate)


def update_1d(arr, host_block: np.ndarray, base: int, pad_value):
    """Write a host block into a device 1D array at ``base`` (donated DUS).
    The block pads to a power of two with ``pad_value``; the caller
    guarantees the padded region is free capacity."""
    n = len(host_block)
    npad = pow2(max(n, 1))
    if base + npad > arr.shape[0]:
        raise ValueError(
            f"update_1d: padded block [{base}, {base + npad}) exceeds "
            f"capacity {arr.shape[0]} — caller must rebuild instead "
            "(dynamic_update_slice would clamp and corrupt synced slots)"
        )
    block = np.full(npad, pad_value, host_block.dtype)
    block[:n] = host_block
    return _update_1d_fn()(arr, jnp.asarray(block, arr.dtype), jnp.int32(base))


def invalidate_rows(valid, row_indices: list[int], capacity: int):
    """Tombstone rows on device. Index list pads to a power of two with
    ``capacity`` (out of range → dropped by the scatter)."""
    npad = pow2(max(len(row_indices), 1))
    idx = np.full(npad, capacity, np.int32)
    idx[: len(row_indices)] = row_indices
    return _invalidate_fn()(valid, jnp.asarray(idx))


@functools.lru_cache(maxsize=None)
def _scatter_fill_fn(fill):
    def f(arr, idx):
        return arr.at[idx].set(fill, mode="drop")

    donate = (0,) if _donate() else ()
    return jax.jit(f, donate_argnums=donate)


def scatter_fill(arr, row_indices: list[int], capacity: int, fill):
    """Scatter a constant into rows on device (donated). Index list pads to
    a power of two with ``capacity`` (out of range → dropped)."""
    npad = pow2(max(len(row_indices), 1))
    idx = np.full(npad, capacity, np.int32)
    idx[: len(row_indices)] = row_indices
    return _scatter_fill_fn(fill)(arr, jnp.asarray(idx))
