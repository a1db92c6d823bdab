"""Embedding service: text preparation, batching, device inference, caching.

Facade parity with the reference EmbeddingService (src/embed/mod.rs:17-292):
persistent-cache lookup by chunk hash → device inference for misses →
write-back, order-preserving merge; cached single-query embed; batched
multi-variant query embed. The CPU ONNX mini-batch loop inverts into large
length-bucketed device batches (SURVEY.md §3.5): tokenize on host, pad to
power-of-two token tiers (bounded recompiles), one jit call per tier batch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from ..chunker import Chunk
from ..utils.constants import get_embedding_cache_dir, get_global_models_cache_dir, is_shutdown_requested
from ..utils.logger import get_logger
from .cache import (
    LruBytesCache,
    PersistentEmbeddingCache,
    default_memory_cache,
    default_query_cache,
)
from ..models.registry import DEFAULT_MODEL, ModelSpec, parse_model

log = get_logger("embed")

# Device batch size: large batches amortize dispatch; env-overridable
# (reference: CODESEARCH_BATCH_SIZE, embedder.rs:249-263).
def _default_batch_size(dims: int) -> int:
    env = os.environ.get("CODESEARCH_BATCH_SIZE")
    if env:
        return max(1, int(env))
    if dims <= 384:
        return 256
    if dims <= 768:
        return 128
    return 64


@dataclass
class EmbeddedChunk:
    chunk: Chunk
    embedding: np.ndarray


def prepare_text(chunk: Chunk) -> str:
    """Embedding text: Context / Signature / Name / Documentation / Code
    (behavioral parity with embed/batch.rs:137-181)."""
    parts: list[str] = []
    if chunk.context:
        parts.append("Context: " + " > ".join(chunk.context))
    if chunk.signature:
        parts.append("Signature: " + chunk.signature)
        words = chunk.signature.split()
        if len(words) >= 2:
            name = words[1].split("<")[0].split("(")[0].split("{")[0]
            if name:
                parts.append("Name: " + name)
    if chunk.docstring:
        cleaned = clean_docstring(chunk.docstring)
        if cleaned:
            parts.append("Documentation: " + cleaned)
    parts.append("Code:\n" + chunk.content)
    return "\n".join(parts)


def clean_docstring(doc: str) -> str:
    """Strip comment markers (parity with embed/batch.rs:197-231)."""
    out: list[str] = []
    for line in doc.split("\n"):
        t = line.strip()
        if t == "*/":
            t = ""
        else:
            for prefix in ("///", "//!", "//", "/**", "*", '"'):
                if t.startswith(prefix):
                    t = t[len(prefix):].strip()
                    break
        if t:
            out.append(t)
    result = " ".join(out)
    return result.removesuffix('"').strip()


class _BertBackend:
    """JAX BERT-family encoder backend with length-bucketed batching.

    On a multi-chip mesh the encode batch shards over the "data" axis
    (params replicate once) — SURVEY §2.2 "DP over ICI": chunk batches
    spread across every chip during indexing with no caller changes."""

    def __init__(self, spec: ModelSpec, models_dir: Path):
        import jax

        from ..models import encoder as enc
        from ..models.tokenizer import load_tokenizer
        from ..parallel.mesh import corpus_mesh

        assert spec.arch is not None
        self.spec = spec
        self.cfg = spec.arch
        model_dir = models_dir / spec.short_name
        self.tokenizer = load_tokenizer(
            model_dir if model_dir.exists() else None,
            lowercase=self.cfg.lowercase,
            max_len=self.cfg.max_len,
            vocab_size=self.cfg.vocab_size,
        )
        st = model_dir / "model.safetensors"
        if st.exists():
            self.params = enc.load_safetensors(st, self.cfg)
            self.pretrained = True
        else:
            self.params = enc.init_params(jax.random.PRNGKey(0), self.cfg)
            self.pretrained = False
            log.warning(
                "no local weights for %s (zero-egress env); using deterministic "
                "random init — place model.safetensors under %s for parity",
                spec.short_name, model_dir,
            )
        self.mesh = corpus_mesh()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            self.params = jax.tree.map(lambda x: jax.device_put(x, repl), self.params)
        self._encode = enc.encode

    def _shard_batch(self, ids: np.ndarray, mask: np.ndarray):
        """Pad rows to the shard count and place sharded over "data"."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        s = self.mesh.shape["data"]
        pad = (-ids.shape[0]) % s
        if pad:
            ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
            mask = np.concatenate(
                [mask, np.ones((pad, mask.shape[1]), mask.dtype)]
            )
        sh = NamedSharding(self.mesh, P("data", None))
        return (
            jax.device_put(jnp.asarray(ids), sh),
            jax.device_put(jnp.asarray(mask), sh),
        )

    @staticmethod
    def _bucket(length: int) -> int:
        b = 16
        while b < length:
            b *= 2
        return min(b, 512)

    def featurize_queries(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Host tokenization for the fused read plane: query variant texts →
        ([Q, T] ids, [Q, T] mask) padded to a power-of-two token bucket so
        XLA compiles O(log) shapes. The device work (encode + top-k + BM25)
        happens in one jit via VectorStore.{search,hybrid_search}_encoded."""
        encs = [self.tokenizer.encode(t) for t in texts]
        max_len = self._bucket(max((len(e.ids) for e in encs), default=1))
        ids = np.zeros((len(texts), max_len), np.int32)
        mask = np.zeros((len(texts), max_len), np.int32)
        for row, e in enumerate(encs):
            L = min(len(e.ids), max_len)
            ids[row, :L] = e.ids[:L]
            mask[row, :L] = 1
        return ids, mask

    def embed_async(self, texts: list[str], half_transfer: bool = False):
        """Host tokenize + dispatch every length bucket WITHOUT materializing
        results; returns a zero-arg callable that blocks and assembles the
        [N, dims] matrix. Dispatching all buckets first pipelines them on
        device, and the caller can overlap its own host work with the encoder
        compute (SURVEY §7 "host/device pipeline overlap").

        ``half_transfer``: fp16 device→host copies (see _HashBackend
        .embed_async — the bulk-index path stores fp16 rows anyway)."""
        import jax.numpy as jnp

        if not texts:
            return lambda: np.zeros((0, self.spec.dims), np.float32)
        encs = [self.tokenizer.encode(t) for t in texts]
        # group by padded-length bucket, then emit device batches (scaled by
        # the mesh size so each chip still sees a full batch)
        order = sorted(range(len(encs)), key=lambda i: len(encs[i].ids))
        bs = _default_batch_size(self.spec.dims)
        if self.mesh is not None:
            bs *= self.mesh.shape["data"]
        pending: list[tuple[list[int], object]] = []
        i = 0
        while i < len(order):
            j = min(i + bs, len(order))
            batch_idx = order[i:j]
            max_len = self._bucket(max(len(encs[b].ids) for b in batch_idx))
            ids = np.zeros((len(batch_idx), max_len), np.int32)
            mask = np.zeros((len(batch_idx), max_len), np.int32)
            for row, b in enumerate(batch_idx):
                L = min(len(encs[b].ids), max_len)
                ids[row, :L] = encs[b].ids[:L]
                mask[row, :L] = 1
            if self.mesh is not None:
                ids_d, mask_d = self._shard_batch(ids, mask)
                vecs = self._encode(self.params, ids_d, mask_d, self.cfg)
            else:
                vecs = self._encode(self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg)
            if half_transfer:
                vecs = vecs.astype(jnp.float16)
            pending.append((batch_idx, vecs))
            i = j
            # NOTE: no mid-embed shutdown break — returning partial zero
            # vectors would poison the caches and the store; cancellation is
            # honored between file batches in the index pipeline instead

        def finish() -> np.ndarray:
            out = np.zeros((len(texts), self.spec.dims), np.float32)
            for batch_idx, vecs in pending:
                out[batch_idx] = np.asarray(vecs, np.float32)[: len(batch_idx)]
            return out

        return finish

    def embed(self, texts: list[str]) -> np.ndarray:
        return self.embed_async(texts)()


class _HashBackend:
    def __init__(self, spec: ModelSpec, table_path: Path | None = None):
        from ..models.hash_embedder import HashEmbedder
        from ..parallel.mesh import corpus_mesh

        self.spec = spec
        self.model = HashEmbedder(spec.dims, table_path=table_path)
        self.pretrained = True  # deterministic; nothing to download
        self.mesh = corpus_mesh()
        if self.mesh is not None:
            # replicate the table once — both the dp-embed path and the
            # sharded query pipeline consume it replicated
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.model.table = jax.device_put(
                self.model.table, NamedSharding(self.mesh, P())
            )

    def embed_async(self, texts: list[str], half_transfer: bool = False):
        """Featurize (host) + dispatch now; returns a zero-arg callable that
        blocks on the device result — lets callers overlap host work with
        the featurize matmul (SURVEY §7 "host/device pipeline overlap").

        ``half_transfer``: convert to fp16 ON DEVICE before the device→host
        copy. The bulk-index path quantizes every row to fp16 at store
        insert anyway (vectordb/store.py _tail_append), so rounding early
        loses nothing downstream while HALVING the dominant transfer of the
        1M-row index bench (8192×384 f32 per slab through the tunnel; the
        experimental tunnel also leaks host RSS proportional to bytes
        moved — CLAUDE.md). Values return as f32 rounded through fp16."""
        if not texts:
            return lambda: np.zeros((0, self.spec.dims), np.float32)
        import jax.numpy as jnp

        from ..models.hash_embedder import batch_features, embed_features

        ids, ws = batch_features(texts)
        if self.mesh is None or len(texts) < 2 * self.mesh.shape["data"]:
            out = embed_features(
                self.model.table, jnp.asarray(ids), jnp.asarray(ws)
            )
            if half_transfer:
                out = out.astype(jnp.float16)
            return lambda: np.asarray(out, np.float32)
        from ..parallel.dp_embed import dp_embed_features

        # the dp path materializes internally (shard_map gather) — no
        # deferral, but featurization already happened above
        return lambda: dp_embed_features(
            self.model.table, ids, ws, self.mesh,
            half_transfer=half_transfer,
        )

    def embed(self, texts: list[str]) -> np.ndarray:
        return self.embed_async(texts)()


class EmbeddingService:
    """Public embedding facade used by index/search/serving layers."""

    def __init__(
        self,
        model: str | ModelSpec = DEFAULT_MODEL,
        cache_dir: Path | None = None,
        use_persistent_cache: bool = True,
        db_path: Path | None = None,
    ):
        """``db_path`` enables per-database fine-tuned assets (a trained
        hash table at <db>/hash_table.npz from `codesearch train`)."""
        spec = model if isinstance(model, ModelSpec) else parse_model(model)
        if spec is None:
            raise ValueError(f"unknown model: {model!r}")
        self.spec = spec
        # overlap the tunneled-TPU first-transfer init with host work
        from ..utils.device import start_transfer_warmup

        start_transfer_warmup()
        models_dir = get_global_models_cache_dir()
        if spec.kind == "hash":
            table_path = None
            if db_path is not None and (Path(db_path) / "hash_table.npz").exists():
                table_path = Path(db_path) / "hash_table.npz"
            self.backend = _HashBackend(spec, table_path=table_path)
            self.trained_table = table_path is not None
        else:
            self.backend = _BertBackend(spec, models_dir)
            self.trained_table = False
        self.mem_cache: LruBytesCache = default_memory_cache()
        self.query_cache: LruBytesCache = default_query_cache()
        self.persistent: PersistentEmbeddingCache | None = None
        if use_persistent_cache:
            cache_name = spec.short_name
            if self.trained_table:
                # trained tables produce different vectors — scope the cache
                from ..utils.hashing import sha256_file

                cache_name += "-t" + sha256_file(Path(db_path) / "hash_table.npz")[:12]
            pdir = cache_dir or get_embedding_cache_dir(cache_name)
            self.persistent = PersistentEmbeddingCache(pdir, spec.dims)

    @property
    def dims(self) -> int:
        return self.spec.dims

    @property
    def model_name(self) -> str:
        return self.spec.short_name

    def fused_kind(self) -> str | None:
        """Which fused single-dispatch read plane this backend rides:
        "hash" (featurize → table gather), "bert" (tokenize → encoder
        forward), or None (no fused path — per-call embed only). ONE
        implementation consulted by the search pipeline and every serving
        surface, so routing cannot drift between them."""
        backend = self.backend
        hb = getattr(backend, "model", None)
        if hb is not None and hasattr(hb, "table"):
            return "hash"
        if hasattr(backend, "featurize_queries"):
            return "bert"
        return None

    # -- chunks ---------------------------------------------------------------

    def embed_chunks(self, chunks: list[Chunk]) -> list[EmbeddedChunk]:
        """Cache-aware batch embed, order-preserving (embed/mod.rs:86-161)."""
        if not chunks:
            return []
        hashes = [c.hash for c in chunks]
        found: dict[str, np.ndarray] = {}
        for h in hashes:
            v = self.mem_cache.get(h)
            if v is not None:
                found[h] = v
        missing_after_mem = [h for h in set(hashes) if h not in found]
        if self.persistent is not None and missing_after_mem:
            disk = self.persistent.get_batch(missing_after_mem)
            for h, v in disk.items():
                found[h] = v
                self.mem_cache.put(h, v)
        to_compute: list[int] = []
        seen: set[str] = set()
        for i, c in enumerate(chunks):
            if c.hash not in found and c.hash not in seen:
                to_compute.append(i)
                seen.add(c.hash)
        if to_compute:
            texts = [prepare_text(chunks[i]) for i in to_compute]
            vecs = self.backend.embed(texts)
            new: dict[str, np.ndarray] = {}
            for row, i in enumerate(to_compute):
                h = chunks[i].hash
                v = vecs[row]
                found[h] = v
                new[h] = v
                self.mem_cache.put(h, v)
            if self.persistent is not None:
                self.persistent.put_batch(new)
        return [EmbeddedChunk(chunk=c, embedding=found[c.hash]) for c in chunks]

    def embed_chunks_matrix_async(self, chunks: list[Chunk]):
        """Async bulk-index fast path: cache lookups + host featurize +
        device dispatch happen NOW; the returned zero-arg callable blocks on
        the device result, writes the caches, and returns the [N, dims]
        matrix. The index pipeline keeps one slab in flight so slab N's
        encoder compute overlaps slab N-1's host store/FTS work (SURVEY §7
        "host/device pipeline overlap")."""
        if not chunks:
            return lambda: np.zeros((0, self.dims), np.float32)
        hashes = [c.hash for c in chunks]
        found: dict[str, np.ndarray] = {}
        for h in hashes:
            v = self.mem_cache.get(h)
            if v is not None:
                found[h] = v
        missing_after_mem = [h for h in set(hashes) if h not in found]
        if self.persistent is not None and missing_after_mem:
            disk = self.persistent.get_batch(missing_after_mem)
            for h, v in disk.items():
                found[h] = v
                self.mem_cache.put(h, v)
        to_compute: list[int] = []
        seen: set[str] = set()
        for i, c in enumerate(chunks):
            if c.hash not in found and c.hash not in seen:
                to_compute.append(i)
                seen.add(c.hash)
        finish_backend = None
        if to_compute:
            texts = [prepare_text(chunks[i]) for i in to_compute]
            # fp16 device→host: every row is quantized to fp16 at store
            # insert anyway; rounding before the copy halves the dominant
            # transfer of a bulk index (and the tunnel's RSS leak rides
            # bytes moved). Cached values round identically, so a later
            # cache hit inserts the same fp16 row.
            finish_backend = self.backend.embed_async(texts,
                                                      half_transfer=True)

        def finish() -> np.ndarray:
            row_of: dict[str, int] = {}
            vecs = None
            if finish_backend is not None:
                vecs = np.asarray(finish_backend())
                new: dict[str, np.ndarray] = {}
                for row, i in enumerate(to_compute):
                    h = chunks[i].hash
                    row_of[h] = row
                    v = vecs[row]
                    new[h] = v
                    self.mem_cache.put(h, v)
                if self.persistent is not None:
                    self.persistent.put_batch(new)
            out = np.empty((len(chunks), self.dims), np.float32)
            fresh = [i for i, c in enumerate(chunks) if c.hash in row_of]
            if fresh:
                out[np.asarray(fresh)] = vecs[
                    np.asarray([row_of[chunks[i].hash] for i in fresh])
                ]
            for i, c in enumerate(chunks):
                if c.hash not in row_of:
                    out[i] = found[c.hash]
            return out

        return finish

    def embed_chunks_matrix(self, chunks: list[Chunk]) -> np.ndarray:
        """Bulk-index fast path: identical cache semantics to embed_chunks
        but returns ONE [N, dims] matrix. Freshly-computed rows land via a
        single vectorized gather from the backend's batch output instead
        of N per-row stacks (np.stack over 8k row views measured 1.7 s of
        a 15.7 s 65k-chunk index run on the one host core)."""
        return self.embed_chunks_matrix_async(chunks)()

    # -- queries ----------------------------------------------------------------

    def embed_query(self, query: str) -> np.ndarray:
        key = "q:" + query
        v = self.query_cache.get(key)
        if v is not None:
            return v
        text = self.spec.query_prefix + query
        vec = self.backend.embed([text])[0]
        self.query_cache.put(key, vec)
        return vec

    def embed_queries_batch(self, queries: list[str]) -> list[np.ndarray]:
        """One device call for all cache misses (embed/mod.rs:184-226)."""
        out: dict[int, np.ndarray] = {}
        misses: list[int] = []
        for i, q in enumerate(queries):
            v = self.query_cache.get("q:" + q)
            if v is not None:
                out[i] = v
            else:
                misses.append(i)
        if misses:
            vecs = self.backend.embed([self.spec.query_prefix + queries[i] for i in misses])
            for row, i in enumerate(misses):
                out[i] = vecs[row]
                self.query_cache.put("q:" + queries[i], vecs[row])
        return [out[i] for i in range(len(queries))]

    def cache_stats(self) -> dict:
        stats = {
            "memory": {
                "entries": len(self.mem_cache),
                "bytes": self.mem_cache.size_bytes,
                "hits": self.mem_cache.hits,
                "misses": self.mem_cache.misses,
            },
            "query": {
                "entries": len(self.query_cache),
                "hits": self.query_cache.hits,
                "misses": self.query_cache.misses,
            },
        }
        if self.persistent is not None:
            stats["persistent"] = self.persistent.stats()
        return stats
