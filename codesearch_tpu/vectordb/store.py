"""Device-resident vector store.

The reference keeps vectors in arroy ANN trees inside LMDB and must
``build_index`` before searching (vectordb/store.rs:94-750). The TPU design
keeps the corpus as a pre-allocated ``[capacity, dims]`` matrix in device
HBM (bf16, optional int8), searched by one exact fused matmul+top-k — so
``build_index`` is O(1), insert is a staged ``dynamic_update_slice`` into
donated device buffers, and delete is a tombstone scatter into the validity
mask. Score = cosine similarity (reference's ``1 - distance``, store.rs:478).

Host persistence replaces LMDB with the same O(change) cost as its
incremental write txns (store.rs:618-651): per generation, an append-only
fp16 row file plus an append-only msgpack op log (add/delete records), with
a tiny JSON manifest recording the valid byte prefix of both. ``save()``
appends only what changed and then atomically renames the manifest — one
rename flips the whole snapshot (a crash mid-append leaves extra bytes past
the manifest's prefix, which the loader ignores). Compaction (rewriting a
new generation without tombstones) runs only when the tombstone ratio
crosses ``VEC_COMPACT_RATIO``.
"""

from __future__ import annotations

import io
import json
import os
import threading
from dataclasses import dataclass, field
from pathlib import Path

import msgpack
import numpy as np

from ..utils.constants import (
    VEC_COMPACT_RATIO,
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


def _fsync_file(fh) -> None:
    fh.flush()
    os.fsync(fh.fileno())


def _fsync_dir(path: Path) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass


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

        # persistence cursors: what the current generation files already hold
        self._generation = 0
        self._persisted_rows = 0
        self._persisted_log_bytes = 0
        self._pending_log: list[bytes] = []          # packed add/del records
        self._needs_rewrite = False                  # force full-generation write

        # device state: matrix + validity mask kept in sync incrementally
        self._device = None                          # (kind, mat, scale, valid)
        self._dev_rows = 0                           # host rows mirrored on device
        self._dev_pending_del: list[int] = []        # rows tombstoned since sync
        self.full_uploads = 0                        # diagnostics (tests assert
        self.incremental_updates = 0                 # no full re-upload per edit)
        # monotone content-change counter: any insert/delete/clear bumps it,
        # so higher layers (response caches) can key on store freshness
        self.mutation_count = 0
        # numpy mirror of _id_of for vectorized row→chunk-id mapping
        # (appends extend it; compaction/clear rebinds _id_of → rebuild)
        self._id_np = np.zeros(0, np.int64)
        self._id_np_src: list | None = None

        if self.db_path.exists():
            self._load()
            self._cleanup_stale_files()
        else:
            if readonly:
                raise DatabaseError(f"database not found: {self.db_path}")
            self.db_path.mkdir(parents=True, exist_ok=True)
            self._host_rows = np.zeros((0, dims), np.float32)
            self._valid_np = np.zeros((0,), bool)

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

    def _embed_path(self, gen: int) -> Path:
        return self.db_path / f"embeddings.{gen}.bin"

    def _log_path(self, gen: int) -> Path:
        return self.db_path / f"chunkmeta.{gen}.log"

    def _cleanup_stale_files(self) -> None:
        """Remove atomic-write temp files and data files from generations no
        longer referenced by the manifest (crashed saves/compactions — the
        analog of the reference's stale .del cleanup, store.rs:799-824)."""
        if self.readonly:
            return
        keep = {self._embed_path(self._generation).name,
                self._log_path(self._generation).name}
        for p in list(self.db_path.glob("*.tmp*")) + \
                list(self.db_path.glob("embeddings.*.bin")) + \
                list(self.db_path.glob("chunkmeta.*.log")):
            if p.name in keep:
                continue
            try:
                p.unlink()
            except OSError:
                pass

    @staticmethod
    def _pack_add(cid: int, meta: ChunkMetadata) -> bytes:
        return msgpack.packb(("a", cid, meta.to_msgpack()), use_bin_type=True)

    @staticmethod
    def _pack_del(cid: int) -> bytes:
        return msgpack.packb(("d", cid), use_bin_type=True)

    def _load(self) -> None:
        if not self._manifest_path.exists():
            self._host_rows = np.zeros((0, self.dims), np.float32)
            self._valid_np = np.zeros((0,), bool)
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
        if manifest.get("version", 1) < 2:
            self._load_v1(manifest)
            return
        self._next_id = int(manifest.get("next_id", 0))
        self._generation = int(manifest.get("generation", 0))
        rows = int(manifest.get("rows", 0))
        log_bytes = int(manifest.get("log_bytes", 0))

        ep = self._embed_path(self._generation)
        if rows and ep.exists():
            flat = np.fromfile(ep, dtype=np.float16, count=rows * self.dims)
            have = flat.size // self.dims
            rows = min(rows, have)
            self._host_rows = (
                flat[: rows * self.dims].reshape(rows, self.dims).astype(np.float32)
            )
        else:
            rows = 0
            self._host_rows = np.zeros((0, self.dims), np.float32)
        self._rows = rows
        self._valid_np = np.zeros((rows,), bool)
        self._id_of = [0] * rows

        lp = self._log_path(self._generation)
        if log_bytes and lp.exists():
            with open(lp, "rb") as f:
                raw = f.read(log_bytes)
            self._replay_log(raw, rows)
        self._persisted_rows = rows
        self._persisted_log_bytes = min(log_bytes, lp.stat().st_size if lp.exists() else 0)

    def _replay_log(self, raw: bytes, max_rows: int) -> None:
        """Rebuild metadata/validity from the op log prefix. Add records map
        1:1 (in order) onto rows of the embedding file."""
        unpacker = msgpack.Unpacker(io.BytesIO(raw), raw=False, strict_map_key=False)
        row = 0
        for rec in unpacker:
            op = rec[0]
            if op == "a":
                if row >= max_rows:
                    break  # add records past the usable matrix prefix
                cid = int(rec[1])
                old = self._row_of.get(cid)
                if old is not None:
                    self._valid_np[old] = False
                self._meta[cid] = ChunkMetadata.from_msgpack(rec[2])
                self._row_of[cid] = row
                self._id_of[row] = cid
                self._valid_np[row] = True
                row += 1
            elif op == "d":
                cid = int(rec[1])
                old = self._row_of.pop(cid, None)
                if old is not None:
                    self._valid_np[old] = False
                self._meta.pop(cid, None)

    def _load_v1(self, manifest: dict) -> None:
        """Legacy round-1 layout (monolithic rewrite-on-save files); migrated
        to the generational layout on the next save."""
        rows = int(manifest.get("rows", 0))
        self._next_id = int(manifest.get("next_id", 0))
        ep = self.db_path / VEC_EMBED_FILE
        if rows and ep.exists():
            flat = np.fromfile(ep, dtype=np.float16)
            have = flat.size // self.dims
            rows = min(rows, have)
            self._host_rows = (
                flat[: rows * self.dims].reshape(rows, self.dims).astype(np.float32)
            )
        else:
            rows = 0
            self._host_rows = np.zeros((0, self.dims), np.float32)
        self._rows = rows
        self._id_of = [int(i) for i in manifest.get("row_ids", [])][:rows]
        self._valid_np = np.zeros((rows,), bool)
        mp = self.db_path / VEC_META_FILE
        if mp.exists():
            with open(mp, "rb") as f:
                raw = msgpack.unpack(f, raw=False, strict_map_key=False)
            self._meta = {int(k): ChunkMetadata.from_msgpack(v) for k, v in raw.items()}
        for row, cid in enumerate(self._id_of):
            if cid in self._meta:
                self._row_of[cid] = row
                self._valid_np[row] = True
        self._needs_rewrite = True

    def save(self) -> None:
        """Persist. O(change) append + manifest flip normally; a full
        compacting generation rewrite only when the tombstone ratio crosses
        ``VEC_COMPACT_RATIO`` (or after clear/migration)."""
        if self.readonly:
            return
        with self._lock:
            tomb = self._rows - int(self._used_valid().sum()) if self._rows else 0
            if (
                self._needs_rewrite
                or (self._rows and tomb / self._rows > VEC_COMPACT_RATIO)
                or not self._embed_path(self._generation).exists()
                and self._persisted_rows > 0
            ):
                self._save_rewrite()
            else:
                self._save_append()

    def _write_manifest(self, rows: int, log_bytes: int) -> None:
        manifest = {
            "version": 2,
            "dims": self.dims,
            "dtype": "float16",
            "generation": self._generation,
            "rows": rows,
            "log_bytes": log_bytes,
            "next_id": self._next_id,
        }
        tmpj = self._manifest_path.with_suffix(".tmpj")
        with open(tmpj, "w") as f:
            f.write(json.dumps(manifest))
            _fsync_file(f)
        os.replace(tmpj, self._manifest_path)
        _fsync_dir(self.db_path)

    def _save_append(self) -> None:
        new_rows = self._rows - self._persisted_rows
        if new_rows == 0 and not self._pending_log:
            # still refresh next_id (it can advance without inserts)
            self._write_manifest(self._persisted_rows, self._persisted_log_bytes)
            return
        ep = self._embed_path(self._generation)
        mode = "r+b" if ep.exists() else "wb"
        with open(ep, mode) as f:
            f.seek(self._persisted_rows * self.dims * 2)
            self._host_rows[self._persisted_rows : self._rows].astype(
                np.float16
            ).tofile(f)
            _fsync_file(f)
        lp = self._log_path(self._generation)
        mode = "r+b" if lp.exists() else "wb"
        with open(lp, mode) as f:
            f.seek(self._persisted_log_bytes)
            blob = b"".join(self._pending_log)
            f.write(blob)
            _fsync_file(f)
        self._persisted_rows = self._rows
        self._persisted_log_bytes += len(blob)
        self._pending_log = []
        self._write_manifest(self._persisted_rows, self._persisted_log_bytes)

    def _save_rewrite(self) -> None:
        """Compact into a fresh generation; the manifest rename is the single
        atomic commit point, after which stale generations are deleted."""
        old_gen = self._generation
        self._compact()
        gen = old_gen + 1
        with open(self._embed_path(gen), "wb") as f:
            self._used().astype(np.float16).tofile(f)
            _fsync_file(f)
        log_bytes = 0
        with open(self._log_path(gen), "wb") as f:
            for cid in self._id_of:
                rec = self._pack_add(cid, self._meta[cid])
                f.write(rec)
                log_bytes += len(rec)
            _fsync_file(f)
        self._generation = gen
        self._persisted_rows = self._rows
        self._persisted_log_bytes = log_bytes
        self._pending_log = []
        self._needs_rewrite = False
        self._write_manifest(self._rows, log_bytes)
        for p in (
            self._embed_path(old_gen), self._log_path(old_gen),
            self.db_path / VEC_EMBED_FILE, self.db_path / VEC_META_FILE,
        ):
            try:
                p.unlink()
            except OSError:
                pass

    def _compact(self) -> None:
        """Drop tombstoned rows from host state; row indices change, so the
        device matrix re-uploads in full on next use."""
        if self._valid_np is None or bool(self._used_valid().all()):
            return
        keep = np.nonzero(self._used_valid())[0]
        self._host_rows = self._used()[keep]
        self._id_of = [self._id_of[i] for i in keep]
        self._valid_np = np.ones(len(keep), bool)
        self._rows = len(keep)
        self._row_of = {cid: i for i, cid in enumerate(self._id_of)}
        self._device = None
        self._dev_rows = 0
        self._dev_pending_del = []

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
                    self._dev_pending_del.append(row)
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
                self._pending_log.append(self._pack_add(cid, meta))
            self.mutation_count += 1
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
                    self._dev_pending_del.append(row)
                    removed += 1
                if self._meta.pop(cid, None) is not None or row is not None:
                    self._pending_log.append(self._pack_del(cid))
            if removed:
                self.mutation_count += 1
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
            self._pending_log = []
            self._needs_rewrite = True
            self._device = None
            self._dev_rows = 0
            self._dev_pending_del = []
            self.mutation_count += 1
            self.save()

    def build_index(self) -> None:
        """O(1): flush staged rows to device. (Parity shim for the
        reference's arroy tree build, which brute-force search obviates.)"""
        with self._lock:
            self._ensure_device()

    # ------------------------------------------------------------------
    # device state + search
    # ------------------------------------------------------------------

    def _mesh(self):
        """The product corpus mesh (None on a single device) — with ≥2
        devices the matrix rows shard over the "data" axis and searches run
        the sharded local-topk + all_gather merge, so servers/CLI use every
        chip with no extra wiring (SURVEY §2.2 "DP over ICI ... REQUIRED")."""
        from ..parallel.mesh import corpus_mesh

        return corpus_mesh()

    def _place(self, host_arr: np.ndarray, dtype, row_sharded: bool):
        """Device placement: replicated on one device, or row-sharded over
        the mesh's data axis."""
        import jax
        import jax.numpy as jnp

        mesh = self._mesh()
        if mesh is None:
            return jnp.asarray(host_arr, dtype)
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("data", *([None] * (host_arr.ndim - 1))) if row_sharded else P()
        return jax.device_put(jnp.asarray(host_arr, dtype), NamedSharding(mesh, spec))

    def _device_cap(self, n: int) -> int:
        """Padded device capacity: power-of-two (few compiled shapes) and a
        multiple of the mesh shard count (even row sharding)."""
        cap = max(VEC_INITIAL_CAPACITY, 1 << max(0, (n - 1).bit_length()))
        mesh = self._mesh()
        if mesh is not None:
            s = mesh.shape["data"]
            cap = ((cap + s - 1) // s) * s
        return cap

    def _upload_full(self):
        """Full host→device upload at padded capacity (sharded over the
        corpus mesh when present)."""
        rows = self._used()
        n = self._rows
        cap = self._device_cap(n)
        padded = np.zeros((cap, self.dims), np.float32)
        padded[:n] = rows
        valid = np.zeros((cap,), bool)
        valid[:n] = self._used_valid()
        if self.int8:
            # quantize on host: a device f32 staging copy at 10M rows
            # (15 GB) would not fit HBM; only int8 + scales transfer
            import jax.numpy as jnp

            absmax = np.abs(padded).max(axis=1)
            scale = np.maximum(absmax, 1e-12) / 127.0
            q = np.clip(
                np.round(padded / scale[:, None]), -127, 127
            ).astype(np.int8)
            self._device = (
                "int8",
                self._place(q, jnp.int8, True),
                self._place(scale, jnp.float32, True),
                self._place(valid, bool, True),
            )
        else:
            import jax.numpy as jnp

            self._device = (
                "bf16",
                self._place(padded, jnp.bfloat16, True),
                None,
                self._place(valid, bool, True),
            )
        self._dev_rows = n
        self._dev_pending_del = []
        self.full_uploads += 1
        return self._device

    def _ensure_device(self):
        """Sync device state with host: incremental dynamic_update_slice for
        appended rows + tombstone scatter for deletes; full re-upload only
        when capacity overflows or after compaction."""
        from . import device_ops

        with self._lock:
            if self._device is None:
                return self._upload_full()
            kind, mat, scale, valid = self._device
            cap = mat.shape[0]
            new = self._rows - self._dev_rows
            if new and self._dev_rows + device_ops.pow2(new) > cap:
                return self._upload_full()
            if new:
                rows = self._host_rows[self._dev_rows : self._rows]
                vr = self._valid_np[self._dev_rows : self._rows]
                if kind == "int8":
                    mat, scale, valid = device_ops.insert_rows_int8(
                        mat, scale, valid, rows, vr, self._dev_rows
                    )
                else:
                    mat, valid = device_ops.insert_rows(
                        mat, valid, rows, vr, self._dev_rows
                    )
                self._dev_rows = self._rows
                self.incremental_updates += 1
            if self._dev_pending_del:
                dels = [r for r in self._dev_pending_del if r < cap]
                if dels:
                    valid = device_ops.invalidate_rows(valid, dels, cap)
                    self.incremental_updates += 1
                self._dev_pending_del = []
            self._device = (kind, mat, scale, valid)
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
        # hold the lock through dispatch: a concurrent insert donates the
        # device buffers, which must not race the kernel's argument capture
        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
            if n_valid == 0:
                return [[] for _ in range(query_vecs.shape[0])]
            dev = self._ensure_device()
            k = min(limit, max(1, n_valid))
            mesh = self._mesh()
            q = jnp.asarray(query_vecs, jnp.float32)
            if mesh is not None:
                from ..parallel.sharded_search import (
                    sharded_cosine_topk,
                    sharded_cosine_topk_int8,
                )

                if dev[0] == "int8":
                    vals, idx = sharded_cosine_topk_int8(
                        q, dev[1], dev[2], dev[3], k, mesh
                    )
                else:
                    vals, idx = sharded_cosine_topk(q, dev[1], dev[3], k, mesh)
            elif dev[0] == "int8":
                vals, idx = cosine_topk_int8(q, dev[1], dev[2], dev[3], k)
            else:
                vals, idx = cosine_topk(q, dev[1], dev[3], k)
        return self._materialize(vals, idx)

    def _id_array(self) -> np.ndarray:
        lst = self._id_of
        if self._id_np_src is not lst:
            self._id_np = np.asarray(lst, np.int64)
            self._id_np_src = lst
        elif len(self._id_np) < len(lst):
            self._id_np = np.concatenate(
                [self._id_np, np.asarray(lst[len(self._id_np):], np.int64)]
            )
        return self._id_np

    def rows_to_ids(self, vals, idx) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized raw result mapping: device (scores, row indices) →
        (chunk_ids [V,k] int64 with -1 for dead/padding, scores [V,k] f32).
        Skips per-result SearchResult materialization — at the reference's
        fusion depth (≤9 variants × 256 candidates) the object churn costs
        milliseconds per query on one host core."""
        import jax

        vals, idx = jax.device_get((vals, idx))
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        with self._lock:
            id_map = self._id_array()
        n = len(id_map)
        if n == 0:
            return np.full(idx.shape, -1, np.int64), vals
        cids = id_map[np.clip(idx, 0, n - 1)]
        bad = (idx >= n) | (idx < 0) | (vals < -1e29)
        return np.where(bad, -1, cids), vals

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
        self, table, ids: np.ndarray, weights: np.ndarray, limit: int,
        raw: bool = False,
    ):
        """Single-dispatch path for hash-model queries: featurized inputs →
        embed+top-k in ONE device call (halves tunnel roundtrips). With
        ``raw`` the result is ``rows_to_ids`` arrays instead of
        materialized SearchResults."""
        import jax.numpy as jnp

        from ..ops.query_pipeline import hash_embed_search, hash_embed_search_int8

        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
            if n_valid == 0:
                if raw:
                    shape = (ids.shape[0], 0)
                    return np.zeros(shape, np.int64), np.zeros(shape, np.float32)
                return [[] for _ in range(ids.shape[0])]
            dev = self._ensure_device()
            k = min(limit, max(1, n_valid))
            mesh = self._mesh()
            if mesh is not None:
                from ..parallel.sharded_search import (
                    sharded_hash_embed_search,
                    sharded_hash_embed_search_int8,
                )

                if dev[0] == "int8":
                    vals, idx = sharded_hash_embed_search_int8(
                        table, jnp.asarray(ids), jnp.asarray(weights),
                        dev[1], dev[2], dev[3], k, mesh,
                    )
                else:
                    vals, idx = sharded_hash_embed_search(
                        table, jnp.asarray(ids), jnp.asarray(weights),
                        dev[1], dev[3], k, mesh,
                    )
            elif dev[0] == "int8":
                vals, idx = hash_embed_search_int8(
                    table, jnp.asarray(ids), jnp.asarray(weights), dev[1], dev[2], dev[3], k
                )
            else:
                vals, idx = hash_embed_search(
                    table, jnp.asarray(ids), jnp.asarray(weights), dev[1], dev[3], k
                )
        if raw:
            return self.rows_to_ids(vals, idx)
        return self._materialize(vals, idx)

    def hybrid_search_featurized(
        self, table, ids: np.ndarray, weights: np.ndarray, limit: int, bm_args,
        raw: bool = False,
    ):
        """THE fused read plane (single device): variant hash-embedding +
        exact vector top-k + BM25 scatter top-k in ONE dispatch
        (ops/query_pipeline.hash_embed_hybrid_search). Returns
        (per-variant vector results, bm25 scores, bm25 dense positions);
        the FTS store maps the latter back to chunks. With ``raw`` the
        vector results are ``rows_to_ids`` arrays, skipping SearchResult
        materialization.

        ``bm_args`` comes from FtsStore.device_query_args()."""
        import jax
        import jax.numpy as jnp

        from ..ops.query_pipeline import (
            hash_embed_hybrid_search,
            hash_embed_hybrid_search_int8,
        )

        fts_dev, cs, cl, ci, kid, kb, imax = bm_args
        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
            if n_valid == 0:
                if raw:
                    shape = (ids.shape[0], 0)
                    return (np.zeros(shape, np.int64),
                            np.zeros(shape, np.float32)), None, None
                return [[] for _ in range(ids.shape[0])], None, None
            dev = self._ensure_device()
            kv = min(limit, max(1, n_valid))
            mesh = self._mesh()
            if mesh is not None:
                from ..parallel.sharded_search import (
                    sharded_hash_embed_hybrid,
                    sharded_hash_embed_hybrid_int8,
                )

                if dev[0] == "int8":
                    vv, vi, bv, bi = sharded_hash_embed_hybrid_int8(
                        table, jnp.asarray(ids), jnp.asarray(weights),
                        dev[1], dev[2], dev[3], kv,
                        fts_dev[0], fts_dev[1], fts_dev[2],
                        jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                        jnp.int32(kid), kb, imax, mesh,
                    )
                else:
                    vv, vi, bv, bi = sharded_hash_embed_hybrid(
                        table, jnp.asarray(ids), jnp.asarray(weights),
                        dev[1], dev[3], kv,
                        fts_dev[0], fts_dev[1], fts_dev[2],
                        jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                        jnp.int32(kid), kb, imax, mesh,
                    )
            elif dev[0] == "int8":
                vv, vi, bv, bi = hash_embed_hybrid_search_int8(
                    table, jnp.asarray(ids), jnp.asarray(weights),
                    dev[1], dev[2], dev[3], kv,
                    fts_dev[0], fts_dev[1], fts_dev[2],
                    jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                    jnp.int32(kid), kb, imax,
                )
            else:
                vv, vi, bv, bi = hash_embed_hybrid_search(
                    table, jnp.asarray(ids), jnp.asarray(weights),
                    dev[1], dev[3], kv,
                    fts_dev[0], fts_dev[1], fts_dev[2],
                    jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                    jnp.int32(kid), kb, imax,
                )
        vv, vi, bv, bi = jax.device_get((vv, vi, bv, bi))
        if raw:
            return self.rows_to_ids(vv, vi), bv, bi
        return self._materialize(vv, vi), bv, bi

    def search_encoded(
        self, params: dict, cfg, ids: np.ndarray, mask: np.ndarray, limit: int,
        raw: bool = False,
    ):
        """Single-dispatch path for BERT-family models: tokenized query
        variants → encoder forward + exact top-k in ONE device call (the
        model-agnostic twin of search_featurized)."""
        import jax.numpy as jnp

        from ..ops.query_pipeline import bert_embed_search, bert_embed_search_int8

        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
            if n_valid == 0:
                if raw:
                    shape = (ids.shape[0], 0)
                    return np.zeros(shape, np.int64), np.zeros(shape, np.float32)
                return [[] for _ in range(ids.shape[0])]
            dev = self._ensure_device()
            k = min(limit, max(1, n_valid))
            mesh = self._mesh()
            if mesh is not None:
                from ..parallel.sharded_search import (
                    sharded_bert_embed_search,
                    sharded_bert_embed_search_int8,
                )

                if dev[0] == "int8":
                    vals, idx = sharded_bert_embed_search_int8(
                        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                        dev[1], dev[2], dev[3], k, mesh,
                    )
                else:
                    vals, idx = sharded_bert_embed_search(
                        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                        dev[1], dev[3], k, mesh,
                    )
            elif dev[0] == "int8":
                vals, idx = bert_embed_search_int8(
                    params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                    dev[1], dev[2], dev[3], k,
                )
            else:
                vals, idx = bert_embed_search(
                    params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                    dev[1], dev[3], k,
                )
        if raw:
            return self.rows_to_ids(vals, idx)
        return self._materialize(vals, idx)

    def hybrid_search_encoded(
        self, params: dict, cfg, ids: np.ndarray, mask: np.ndarray, limit: int,
        bm_args, raw: bool = False,
    ):
        """THE fused read plane for BERT-family models: encoder forward +
        exact vector top-k + BM25 top-k in ONE dispatch (single device or
        sharded over the corpus mesh). Same contract as
        hybrid_search_featurized; ``bm_args`` from FtsStore.device_query_args."""
        import jax
        import jax.numpy as jnp

        from ..ops.query_pipeline import (
            bert_embed_hybrid_search,
            bert_embed_hybrid_search_int8,
        )

        fts_dev, cs, cl, ci, kid, kb, imax = bm_args
        with self._lock:
            n_valid = int(self._used_valid().sum()) if self._valid_np is not None else 0
            if n_valid == 0:
                if raw:
                    shape = (ids.shape[0], 0)
                    return (np.zeros(shape, np.int64),
                            np.zeros(shape, np.float32)), None, None
                return [[] for _ in range(ids.shape[0])], None, None
            dev = self._ensure_device()
            kv = min(limit, max(1, n_valid))
            mesh = self._mesh()
            if mesh is not None:
                from ..parallel.sharded_search import (
                    sharded_bert_embed_hybrid,
                    sharded_bert_embed_hybrid_int8,
                )

                if dev[0] == "int8":
                    vv, vi, bv, bi = sharded_bert_embed_hybrid_int8(
                        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                        dev[1], dev[2], dev[3], kv,
                        fts_dev[0], fts_dev[1], fts_dev[2],
                        jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                        jnp.int32(kid), kb, imax, mesh,
                    )
                else:
                    vv, vi, bv, bi = sharded_bert_embed_hybrid(
                        params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                        dev[1], dev[3], kv,
                        fts_dev[0], fts_dev[1], fts_dev[2],
                        jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                        jnp.int32(kid), kb, imax, mesh,
                    )
            elif dev[0] == "int8":
                vv, vi, bv, bi = bert_embed_hybrid_search_int8(
                    params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                    dev[1], dev[2], dev[3], kv,
                    fts_dev[0], fts_dev[1], fts_dev[2],
                    jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                    jnp.int32(kid), kb, imax,
                )
            else:
                vv, vi, bv, bi = bert_embed_hybrid_search(
                    params, jnp.asarray(ids), jnp.asarray(mask), cfg,
                    dev[1], dev[3], kv,
                    fts_dev[0], fts_dev[1], fts_dev[2],
                    jnp.asarray(cs), jnp.asarray(cl), jnp.asarray(ci),
                    jnp.int32(kid), kb, imax,
                )
        vv, vi, bv, bi = jax.device_get((vv, vi, bv, bi))
        if raw:
            return self.rows_to_ids(vv, vi), bv, bi
        return self._materialize(vv, vi), bv, bi

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
            disk = 0
            for p in (self._embed_path(self._generation), self._log_path(self._generation)):
                if p.exists():
                    disk += p.stat().st_size
            bytes_per = 1 if self.int8 else 2
            return StoreStats(
                chunk_count=n,
                dims=self.dims,
                capacity=rows,
                tombstones=tomb,
                device_bytes=rows * self.dims * bytes_per,
                disk_bytes=disk,
            )
