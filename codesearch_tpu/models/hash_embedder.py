"""Deterministic weights-free code embedder (``code-hash-384``).

A TPU-native bootstrap model that needs zero downloaded assets: bag-of-
subwords random projection. Each code token (identifier subwords, whole
identifiers, adjacent-token bigrams) hashes to a row of a deterministic
random table [V, d]; a document embeds as the L2-normalized TF-weighted sum
of its token rows — mathematically a Johnson-Lindenstrauss random projection
of a sparse lexical vector, so cosine similarity approximates weighted
token-overlap similarity. Runs as one gather + weighted-sum matmul per
batch on device, and the table is trainable (contrastive fine-tuning in
``train/``) since it is just an embedding matrix.
"""

from __future__ import annotations

import functools
import math
from collections import Counter
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hashing import stable_u64
from .tokenizer import code_tokens

VOCAB_BUCKETS = 1 << 16
TABLE_SEED = 0xC0DE5EA
_BIGRAM_WEIGHT = 0.7
_WHOLE_IDENT_WEIGHT = 1.5
MAX_TOKENS = 512


def save_table(table, path) -> None:
    """Persist a (fine-tuned) table atomically as .npz."""
    import os

    tmp = str(path) + ".tmp.npz"  # savez appends .npz only when missing
    np.savez(tmp, table=np.asarray(table, np.float32))
    os.replace(tmp, str(path))


def _round_bf16_f32(x: np.ndarray) -> np.ndarray:
    """Round fp32 to the nearest bf16 (ties-to-even), kept as fp32 — the
    exact values a device gather of the bf16 table yields, so the host
    read plane scores with byte-identical inputs. Bit-level RNE: ~50 ms at
    25M values where ml_dtypes' astype round-trip measures ~1.7 s on one
    core. Finite inputs only (tables are); parity with ml_dtypes is
    pinned by test."""
    u = np.ascontiguousarray(x, np.float32).view(np.uint32)
    r = (u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1))) \
        & np.uint32(0xFFFF0000)
    return r.view(np.float32)


def load_table_host(path, dims: int) -> np.ndarray | None:
    """Fine-tuned table as bf16-rounded host fp32; None when missing or
    invalid (caller falls back to the default table)."""
    try:
        data = np.load(str(path))["table"].astype(np.float32)
        if data.shape[1] != dims:
            raise ValueError(f"table dims {data.shape[1]} != model dims {dims}")
        return _round_bf16_f32(data)
    except Exception:
        return None


def load_table(path, dims: int, dtype=jnp.bfloat16) -> jax.Array:
    """Load a fine-tuned table; falls back to the deterministic default."""
    host = load_table_host(path, dims)
    if host is None:
        return make_table(dims, dtype=dtype)
    return jnp.asarray(host, dtype)


def _table_bits_path(dims: int, buckets: int) -> Path:
    from ..utils.constants import get_config_dir

    # keyed per backend: threefry BITS are backend-identical, but
    # random.normal's erf_inv lowering is not guaranteed bit-identical
    # across backends — a twin must derive from the SAME backend's table
    backend = jax.default_backend()
    return (get_config_dir()
            / f"hash_table_{TABLE_SEED:08x}_{buckets}x{dims}.{backend}.u16")


def _load_table_bits(dims: int, buckets: int) -> np.ndarray | None:
    """Cached bf16 bits of the default table ([buckets*dims] u16), or None."""
    try:
        bits = np.fromfile(_table_bits_path(dims, buckets), np.uint16)
    except OSError:
        return None
    return bits if bits.size == buckets * dims else None


def _save_table_bits(bits: np.ndarray, dims: int, buckets: int) -> None:
    """Best-effort atomic write of the default table's bf16 bits."""
    import os

    cache = _table_bits_path(dims, buckets)
    try:
        tmp = Path(f"{cache}.{os.getpid()}.tmp")
        np.ascontiguousarray(bits, np.uint16).tofile(tmp)
        os.replace(tmp, cache)
    except OSError:
        pass


def _bits_to_f32(bits: np.ndarray, dims: int, buckets: int) -> np.ndarray:
    return ((bits.astype(np.uint32) << np.uint32(16))
            .view(np.float32).reshape(buckets, dims))


def make_table(dims: int, buckets: int = VOCAB_BUCKETS, dtype=jnp.bfloat16) -> jax.Array:
    """Deterministic random table on the DEFAULT backend; rows
    ~N(0, 1/sqrt(d)) (JL projection). The values are the historical jax
    threefry stream — EMBEDDER_VERSION-stable, and measured to rank best
    on the labeled sets (a numpy-Philox regeneration was ablated across
    10 seeds: reference-corpus accuracy 8/9 → 6-8/9, self-corpus 6/9 →
    2-5/9).

    Placement rules (rig-aware): on an accelerator the table is generated
    ON DEVICE from the 8-byte PRNG key — never uploaded (the experimental
    tunnel client leaks ~1× of every host→device transfer as host RSS).
    On the CPU backend, materializing the stream costs ~1 s of single-core
    erf_inv work, so the bf16 bits are cached under the config dir (48 MB
    at the default shape; atomic best-effort write) and later processes
    build the array from them in ~0.1 s. The same bits file feeds the host
    read plane's twin (HashEmbedder.table_np)."""
    on_cpu = jax.default_backend() == "cpu"
    if on_cpu and dtype == jnp.bfloat16:
        import ml_dtypes

        bits = _load_table_bits(dims, buckets)
        if bits is not None:
            return jnp.asarray(bits.view(ml_dtypes.bfloat16).reshape(buckets, dims))
    t = jax.random.normal(
        jax.random.PRNGKey(TABLE_SEED), (buckets, dims), dtype=jnp.float32
    )
    t = (t / math.sqrt(dims)).astype(dtype)
    if on_cpu and dtype == jnp.bfloat16:
        _save_table_bits(np.asarray(t).view(np.uint16).ravel(), dims, buckets)
    return t


def _featurize_py(text: str) -> tuple[np.ndarray, np.ndarray]:
    """Pure-Python featurization (byte-parity reference for the native tier).

    Features in first-occurrence order: subword unigrams (w = 1+ln tf, ×1.5
    for whole identifiers), then adjacent-token bigrams (w = 0.7·(1+ln tf)).
    """
    toks = code_tokens(text)
    feats: Counter[int] = Counter()
    whole: set[int] = set()
    for t in toks:
        b = stable_u64(t) % VOCAB_BUCKETS
        feats[b] += 1
        if "_" in t or len(t) > 12:
            whole.add(b)
    bigrams: Counter[int] = Counter()
    for a, b2 in zip(toks, toks[1:]):
        bigrams[stable_u64(a + "\x1f" + b2) % VOCAB_BUCKETS] += 1

    ids: list[int] = []
    ws: list[float] = []
    for b, tf in feats.items():
        w = 1.0 + math.log(tf)
        if b in whole:
            w *= _WHOLE_IDENT_WEIGHT
        ids.append(b)
        ws.append(w)
    for b, tf in bigrams.items():
        ids.append(b)
        ws.append(_BIGRAM_WEIGHT * (1.0 + math.log(tf)))
    return np.asarray(ids, np.int64), np.asarray(ws, np.float32)


def _cap_features(
    ids: np.ndarray, ws: np.ndarray, max_tokens: int
) -> tuple[np.ndarray, np.ndarray]:
    """Empty/overflow handling shared by the per-text and batch paths."""
    if ids.size == 0:
        return np.zeros(1, np.int32), np.zeros(1, np.float32)
    if ids.size > max_tokens:
        # keep the highest-weight features; stable on ties (C++ parity)
        order = np.argsort(-ws, kind="stable")[:max_tokens]
        order.sort()  # preserve original order among survivors
        ids = ids[order]
        ws = ws[order]
    return ids.astype(np.int32), ws


def featurize(text: str, max_tokens: int = MAX_TOKENS) -> tuple[np.ndarray, np.ndarray]:
    """(bucket_ids [T], weights [T]); native C++ path when available."""
    from ..native import featurize_native

    result = featurize_native(text) if featurize_native is not None else None
    if result is None:
        result = _featurize_py(text)
    return _cap_features(*result, max_tokens)


def batch_features(
    texts: list[str], max_tokens: int = MAX_TOKENS
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a batch of featurized texts to [B, T] ids + weights (0-weight pad).
    One native call featurizes the whole slab when available (amortizes
    per-text ctypes marshaling — the indexing write plane's hot loop)."""
    from ..native import featurize_batch_native, featurize_native

    raw = (featurize_batch_native(texts)
           if featurize_native is not None and texts else None)
    if raw is not None:
        pairs = [_cap_features(i, w, max_tokens) for i, w in raw]
    else:
        pairs = [featurize(t, max_tokens) for t in texts]
    t_max = max((len(i) for i, _ in pairs), default=1)
    # round up so XLA sees few distinct shapes (avoids recompile storms)
    t_max = 1 << max(4, (t_max - 1).bit_length())
    t_max = min(t_max, max_tokens)
    b = len(texts)
    ids = np.zeros((b, t_max), np.int32)
    ws = np.zeros((b, t_max), np.float32)
    for row, (i, w) in enumerate(pairs):
        m = min(len(i), t_max)
        ids[row, :m] = i[:m]
        ws[row, :m] = w[:m]
    return ids, ws


@functools.partial(jax.jit, donate_argnums=())
def embed_features(table: jax.Array, ids: jax.Array, weights: jax.Array) -> jax.Array:
    """[B, T] bucket ids + weights → [B, d] L2-normalized embeddings."""
    rows = table[ids].astype(jnp.float32)                  # [B, T, d] gather
    vec = jnp.einsum("btd,bt->bd", rows, weights)
    return vec / jnp.maximum(jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-12)


class HashEmbedder:
    """Stateful convenience wrapper holding the device table."""

    def __init__(self, dims: int, table_path=None):
        self.dims = dims
        self._host_table: np.ndarray | None = None
        host = load_table_host(table_path, dims) if table_path is not None \
            else None
        if host is not None:   # fine-tuned table (small upload, rare path)
            self.table = jnp.asarray(host, jnp.bfloat16)
            self._host_table = host
        else:
            # default table: generated on the DEFAULT backend (on-device on
            # accelerators — zero upload); host twin resolves lazily
            self.table = make_table(dims)

    def table_np(self) -> np.ndarray:
        """Host fp32 twin of the device table (identical values:
        bf16-rounded) for VectorStore.search_featurized_host. Lazy — only
        small-corpus processes pay for it: served from the bits cache when
        present, else fetched ONCE from the device table (device→host, the
        leak-free direction on the tunneled rig) and cached to disk for
        every later process. `.table` is only ever reassigned
        value-preserving (mesh replication's device_put); trained tables
        arrive via a fresh HashEmbedder."""
        if self._host_table is None:
            bits = _load_table_bits(self.dims, VOCAB_BUCKETS)
            if bits is not None and self.table.shape == (VOCAB_BUCKETS, self.dims):
                self._host_table = _bits_to_f32(bits, self.dims, VOCAB_BUCKETS)
            else:
                fetched = np.asarray(
                    jnp.asarray(self.table, jnp.float32)
                ).astype(np.float32)
                if self.table.shape == (VOCAB_BUCKETS, self.dims) \
                        and self.table.dtype == jnp.bfloat16:
                    _save_table_bits(
                        (fetched.view(np.uint32) >> np.uint32(16))
                        .astype(np.uint16).ravel(),
                        self.dims, VOCAB_BUCKETS,
                    )
                self._host_table = fetched
        return self._host_table

    def embed_texts(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dims), np.float32)
        ids, ws = batch_features(texts)
        out = embed_features(self.table, jnp.asarray(ids), jnp.asarray(ws))
        return np.asarray(out)
