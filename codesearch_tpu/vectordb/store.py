"""Device-resident vector store.

The reference keeps vectors in arroy ANN trees inside LMDB and must
``build_index`` before searching (vectordb/store.rs:94-750). The TPU design
keeps the corpus as a pre-allocated ``[capacity, dims]`` matrix in device
HBM (bf16, optional int8), searched by one exact fused matmul+top-k — so
``build_index`` is O(1), insert is a staged ``dynamic_update_slice``, and
delete is a tombstone mask (compaction on save). Score = cosine similarity
(reference's ``1 - distance``, store.rs:478).

Host persistence replaces LMDB: raw row-major matrix file + msgpack chunk
metadata + a JSON manifest, all written with atomic tmp+rename (the ACID
analog of LMDB commits). Capacity auto-doubles when full (the analog of
MDB_MAP_FULL resize, store.rs:252-328).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field
from pathlib import Path

import msgpack
import numpy as np

from ..utils.constants import (
    VEC_EMBED_FILE,
    VEC_INITIAL_CAPACITY,
    VEC_MANIFEST_FILE,
    VEC_MAX_CAPACITY,
    VEC_META_FILE,
)
from ..utils.errors import DatabaseError
from ..utils.logger import get_logger

log = get_logger("vectordb")


@dataclass
class ChunkMetadata:
    path: str
    content: str
    start_line: int
    end_line: int
    kind: str
    context: list[str] = field(default_factory=list)
    signature: str | None = None
    docstring: str | None = None
    hash: str = ""
    language: str | None = None

    def to_msgpack(self) -> dict:
        return self.__dict__

    @classmethod
    def from_msgpack(cls, d: dict) -> "ChunkMetadata":
        return cls(**d)

    @property
    def searchable_text(self) -> str:
        """Text used for FTS-only result rendering (store.rs:42-84)."""
        parts = []
        if self.signature:
            parts.append(self.signature)
        if self.docstring:
            parts.append(self.docstring)
        parts.append(self.content)
        return "\n".join(parts)


@dataclass
class SearchResult:
    chunk_id: int
    score: float
    metadata: ChunkMetadata


@dataclass
class StoreStats:
    chunk_count: int
    dims: int
    capacity: int
    tombstones: int
    device_bytes: int
    disk_bytes: int


class VectorStore:
    """Single-device store. The sharded multi-chip variant lives in
    ``parallel/sharded_store.py`` and reuses this class per shard."""

    def __init__(
        self,
        db_path: str | Path,
        dims: int,
        readonly: bool = False,
        int8: bool = False,
    ):
        self.db_path = Path(db_path)
        self.dims = dims
        self.readonly = readonly
        self.int8 = int8
        self._lock = threading.RLock()

        self._meta: dict[int, ChunkMetadata] = {}
        self._row_of: dict[int, int] = {}
        self._id_of: list[int] = []          # row → chunk id
        self._next_id = 0

        # host-side staging: capacity buffers + used-row count (geometric
        # growth — per-batch np.concatenate would be O(n^2) over an index run)
        self._host_rows: np.ndarray | None = None   # [capacity, dims] f32
        self._valid_np: np.ndarray | None = None    # [capacity] bool
        self._rows = 0                               # used rows
        self._device = None                          # lazily built device state
        self._device_dirty = True

        if self.db_path.exists():
            self._cleanup_stale_tmp()
            self._load()
        else:
            if readonly:
                raise DatabaseError(f"database not found: {self.db_path}")
            self.db_path.mkdir(parents=True, exist_ok=True)
            self._host_rows = np.zeros((0, dims), np.float32)
            self._valid_np = np.zeros((0,), bool)
            self._rows = 0

    def _cleanup_stale_tmp(self) -> None:
        """Remove leftover atomic-write temp files from crashed runs
        (analog of the reference's stale .del cleanup, store.rs:799-824)."""
        if self.readonly:
            return
        for p in self.db_path.glob("*.tmp*"):
            try:
                p.unlink()
            except OSError:
                pass

    def _used(self) -> np.ndarray:
        return self._host_rows[: self._rows]

    def _used_valid(self) -> np.ndarray:
        return self._valid_np[: self._rows]

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    @property
    def _manifest_path(self) -> Path:
        return self.db_path / VEC_MANIFEST_FILE

    @property
    def _embed_path(self) -> Path:
        return self.db_path / VEC_EMBED_FILE

    @property
    def _meta_path(self) -> Path:
        return self.db_path / VEC_META_FILE

    def _load(self) -> None:
        if not self._manifest_path.exists():
            self._host_rows = np.zeros((0, self.dims), np.float32)
            self._valid_np = np.zeros((0,), bool)
            self._rows = 0
            return
        try:
            manifest = json.loads(self._manifest_path.read_text())
        except (OSError, json.JSONDecodeError) as e:
            raise DatabaseError(f"corrupt manifest at {self._manifest_path}: {e}")
        if manifest.get("dims") != self.dims:
            raise DatabaseError(
                f"dimension mismatch: store has {manifest.get('dims')}, "
                f"requested {self.dims}"
            )
        rows = int(manifest.get("rows", 0))
        self._next_id = int(manifest.get("next_id", 0))
        if rows and self._embed_path.exists():
            flat = np.fromfile(self._embed_path, dtype=np.float16)
            have = flat.size // self.dims
            rows = min(rows, have)
            self._host_rows = flat[: rows * self.dims].reshape(rows, self.dims).astype(np.float32)
        else:
            rows = 0
            self._host_rows = np.zeros((0, self.dims), np.float32)
        self._rows = rows
        self._id_of = [int(i) for i in manifest.get("row_ids", [])][:rows]
        self._valid_np = np.zeros((rows,), bool)
        if self._meta_path.exists():
            with open(self._meta_path, "rb") as f:
                raw = msgpack.unpack(f, raw=False, strict_map_key=False)
            self._meta = {int(k): ChunkMetadata.from_msgpack(v) for k, v in raw.items()}
        for row, cid in enumerate(self._id_of):
            if cid in self._meta:
                self._row_of[cid] = row
                self._valid_np[row] = True
        self._device_dirty = True

    def save(self) -> None:
        """Atomic snapshot: compacts tombstones, writes matrix+meta+manifest."""
        if self.readonly:
            return
        with self._lock:
            self._compact()
            rows = self._used()
            tmp = self._embed_path.with_suffix(".tmp")
            rows.astype(np.float16).tofile(tmp)
            os.replace(tmp, self._embed_path)
            tmpm = self._meta_path.with_suffix(".tmp")
            with open(tmpm, "wb") as f:
                msgpack.pack({k: v.to_msgpack() for k, v in self._meta.items()}, f)
            os.replace(tmpm, self._meta_path)
            manifest = {
                "dims": self.dims,
                "rows": int(rows.shape[0]),
                "next_id": self._next_id,
                "row_ids": self._id_of,
                "dtype": "float16",
                "version": 1,
            }
            tmpj = self._manifest_path.with_suffix(".tmpj")
            tmpj.write_text(json.dumps(manifest))
            os.replace(tmpj, self._manifest_path)

    def _compact(self) -> None:
        """Drop tombstoned rows from host state (device rebuilt on demand)."""
        if self._valid_np is None or bool(self._used_valid().all()):
            return
        keep = np.nonzero(self._used_valid())[0]
        self._host_rows = self._used()[keep]
        self._id_of = [self._id_of[i] for i in keep]
        self._valid_np = np.ones(len(keep), bool)
        self._rows = len(keep)
        self._row_of = {cid: i for i, cid in enumerate(self._id_of)}
        self._device_dirty = True

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def next_id(self) -> int:
        return self._next_id

    def insert_chunks_with_ids(
        self,
        embeddings: np.ndarray,          # [n, dims] (normalized)
        metadatas: list[ChunkMetadata],
        ids: list[int] | None = None,
    ) -> list[int]:
        if self.readonly:
            raise DatabaseError("store opened readonly")
        n = embeddings.shape[0]
        if n != len(metadatas):
            raise ValueError("embeddings/metadata length mismatch")
        if n == 0:
            return []
        if embeddings.shape[1] != self.dims:
            raise DatabaseError(
                f"dimension mismatch: got {embeddings.shape[1]}, store is {self.dims}"
            )
        with self._lock:
            if ids is None:
                ids = list(range(self._next_id, self._next_id + n))
            self._next_id = max(self._next_id, max(ids) + 1)
            # replace semantics: tombstone any existing row for these ids
            for cid in ids:
                row = self._row_of.pop(cid, None)
                if row is not None:
                    self._valid_np[row] = False
            base = self._rows
            if base + n > VEC_MAX_CAPACITY:
                raise DatabaseError("vector store at max capacity")
            if base + n > self._host_rows.shape[0]:
                new_cap = max(base + n, max(2 * self._host_rows.shape[0], 1024))
                grown = np.zeros((new_cap, self.dims), np.float32)
                grown[:base] = self._host_rows[:base]
                self._host_rows = grown
                grown_v = np.zeros((new_cap,), bool)
                grown_v[:base] = self._valid_np[:base]
                self._valid_np = grown_v
            self._host_rows[base : base + n] = embeddings.astype(np.float32)
            self._valid_np[base : base + n] = True
            self._rows = base + n
            for i, (cid, meta) in enumerate(zip(ids, metadatas)):
                self._meta[cid] = meta
                self._row_of[cid] = base + i
                self._id_of.append(cid)
            self._device_dirty = True
            return ids

    def delete_chunks(self, ids: list[int]) -> int:
        if self.readonly:
            raise DatabaseError("store opened readonly")
        removed = 0
        with self._lock:
            for cid in ids:
                row = self._row_of.pop(cid, None)
                if row is not None:
                    self._valid_np[row] = False
                    removed += 1
                self._meta.pop(cid, None)
            if removed:
                self._device_dirty = True
        return removed

    def clear(self) -> None:
        with self._lock:
            self._meta.clear()
            self._row_of.clear()
            self._id_of = []
            self._host_rows = np.zeros((0, self.dims), np.float32)
            self._valid_np = np.zeros((0,), bool)
            self._rows = 0
            self._next_id = 0
            self._device_dirty = True
            self.save()

    def build_index(self) -> None:
        """O(1): flush staged rows to device. (Parity shim for the
        reference's arroy tree build, which brute-force search obviates.)"""
        self._ensure_device()

    # ------------------------------------------------------------------
    # device state + search
    # ------------------------------------------------------------------

    def _ensure_device(self):
        import jax.numpy as jnp

        with self._lock:
            if not self._device_dirty and self._device is not None:
                return self._device
            rows = self._used()
            n = self._rows
            # pad to a power-of-two row count so insert batches don't force
            # a recompile per search (few distinct shapes)
            cap = max(VEC_INITIAL_CAPACITY, 1 << max(0, (n - 1).bit_length()))
            padded = np.zeros((cap, self.dims), np.float32)
            padded[:n] = rows
            valid = np.zeros((cap,), bool)
            valid[:n] = self._used_valid()
            if self.int8:
                # quantize on host: a device f32 staging copy at 10M rows
                # (15 GB) would not fit HBM; only int8 + scales transfer
                absmax = np.abs(padded).max(axis=1)
                scale = np.maximum(absmax, 1e-12) / 127.0
                q = np.clip(
                    np.round(padded / scale[:, None]), -127, 127
                ).astype(np.int8)
                self._device = (
                    "int8", jnp.asarray(q), jnp.asarray(scale, jnp.float32),
                    jnp.asarray(valid),
                )
            else:
                self._device = ("bf16", jnp.asarray(padded, jnp.bfloat16), None, jnp.asarray(valid))
            self._device_dirty = False
            return self._device

    def search_batch(
        self, query_vecs: np.ndarray, limit: int
    ) -> list[list[SearchResult]]:
        """Batched multi-query exact search — one device call for all
        query variants (replaces the reference's rayon-parallel per-variant
        ANN searches, search/mod.rs:504-590)."""
        import jax.numpy as jnp

        from ..ops.topk import cosine_topk, cosine_topk_int8

        if query_vecs.ndim == 1:
            query_vecs = query_vecs[None, :]
        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
        if n_valid == 0:
            return [[] for _ in range(query_vecs.shape[0])]
        dev = self._ensure_device()
        k = min(limit, max(1, n_valid))
        if dev[0] == "int8":
            vals, idx = cosine_topk_int8(
                jnp.asarray(query_vecs), dev[1], dev[2], dev[3], k
            )
        else:
            vals, idx = cosine_topk(jnp.asarray(query_vecs), dev[1], dev[3], k)
        return self._materialize(vals, idx)

    def _materialize(self, vals, idx) -> list[list[SearchResult]]:
        # one device→host transfer for both results (tunnel roundtrips are
        # the latency floor on remote-attached TPUs)
        import jax

        vals, idx = jax.device_get((vals, idx))
        out: list[list[SearchResult]] = []
        with self._lock:
            for qi in range(vals.shape[0]):
                results: list[SearchResult] = []
                for score, row in zip(vals[qi], idx[qi]):
                    if score < -1e29:
                        continue
                    if row >= len(self._id_of):
                        continue
                    cid = self._id_of[row]
                    meta = self._meta.get(cid)
                    if meta is None:
                        continue
                    results.append(SearchResult(chunk_id=cid, score=float(score), metadata=meta))
                out.append(results)
        return out

    def search_featurized(
        self, table, ids: np.ndarray, weights: np.ndarray, limit: int
    ) -> list[list[SearchResult]]:
        """Single-dispatch path for hash-model queries: featurized inputs →
        embed+top-k in ONE device call (halves tunnel roundtrips)."""
        import jax.numpy as jnp

        from ..ops.query_pipeline import hash_embed_search, hash_embed_search_int8

        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
        if n_valid == 0:
            return [[] for _ in range(ids.shape[0])]
        dev = self._ensure_device()
        k = min(limit, max(1, n_valid))
        if dev[0] == "int8":
            vals, idx = hash_embed_search_int8(
                table, jnp.asarray(ids), jnp.asarray(weights), dev[1], dev[2], dev[3], k
            )
        else:
            vals, idx = hash_embed_search(
                table, jnp.asarray(ids), jnp.asarray(weights), dev[1], dev[3], k
            )
        return self._materialize(vals, idx)

    def search(self, query_vec: np.ndarray, limit: int) -> list[SearchResult]:
        return self.search_batch(query_vec, limit)[0]

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def get_chunk(self, chunk_id: int) -> ChunkMetadata | None:
        return self._meta.get(chunk_id)

    def get_chunks_by_file(self, path: str) -> list[int]:
        """Chunk ids for a file (orphan sweep, store.rs:529-543)."""
        return [cid for cid, m in self._meta.items() if m.path == path]

    def all_paths(self) -> set[str]:
        return {m.path for m in self._meta.values()}

    def __len__(self) -> int:
        return len(self._meta)

    def stats(self) -> StoreStats:
        with self._lock:
            n = len(self._meta)
            rows = self._rows
            tomb = rows - (int(self._used_valid().sum()) if self._valid_np is not None else 0)
            disk = self._embed_path.stat().st_size if self._embed_path.exists() else 0
            disk += self._meta_path.stat().st_size if self._meta_path.exists() else 0
            bytes_per = 1 if self.int8 else 2
            return StoreStats(
                chunk_count=n,
                dims=self.dims,
                capacity=rows,
                tombstones=tomb,
                device_bytes=rows * self.dims * bytes_per,
                disk_bytes=disk,
            )
