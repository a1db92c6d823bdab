"""BM25 full-text store.

Replaces tantivy (src/fts/tantivy_store.rs) with a columnar postings engine
built for large corpora: postings accumulate as parallel numpy buffers
(term hash, doc id, tf_content, tf_signature) with geometric growth, and
``commit`` sorts them into CSR form (unique terms + offsets) persisted as
one .npz with atomic replace. Scoring walks each query term's CSR range and
accumulates BM25 into a dense score vector — no Python loops over postings.
There is no background merge thread to crash (the NoMergePolicy /
"writer was killed" machinery of the reference disappears).

Query semantics parity:
- ``search``: BM25 with signature terms boosted ×2 and a ×3 score boost for
  chunks matching a structural-intent kind (tantivy_store.rs:394-458).
- ``search_exact``: identifier term matched in signature (boost ×3) ∪
  content, AND-ed with kind when provided (tantivy_store.rs:460-524).

Fusion consumes ranks (RRF), so absolute score scale differences from
tantivy are immaterial.
"""

from __future__ import annotations

import math
import os
import threading
from dataclasses import dataclass
from pathlib import Path

import msgpack
import numpy as np

from ..models.tokenizer import code_tokens
from ..utils.hashing import stable_u64
from ..utils.logger import get_logger

log = get_logger("fts")

_K1 = 1.2
_B = 0.75
_SIG_BOOST = 2.0
_KIND_BOOST = 3.0
_EXACT_SIG_BOOST = 3.0


def _to_i64(h: int) -> int:
    """Unsigned 64-bit hash → signed-int64 key (matches the native tier)."""
    return h - (1 << 64) if h >= (1 << 63) else h


def term_keys(text: str) -> np.ndarray:
    """Ordered token term keys (int64, duplicates kept). Native when
    available; byte-identical Python fallback."""
    from ..native import token_hashes_native

    keys = token_hashes_native(text)
    if keys is not None:
        return keys
    toks = code_tokens(text)
    if not toks:
        return np.zeros(0, np.int64)
    return np.asarray([_to_i64(stable_u64(t)) for t in toks], np.int64)


@dataclass
class FtsResult:
    chunk_id: int
    score: float
    path: str
    kind: str


class _GrowBuf:
    """Geometric-growth 1D numpy buffer."""

    def __init__(self, dtype):
        self.a = np.zeros(1024, dtype)
        self.n = 0

    def extend(self, values: np.ndarray) -> None:
        need = self.n + len(values)
        if need > len(self.a):
            cap = max(need, 2 * len(self.a))
            grown = np.zeros(cap, self.a.dtype)
            grown[: self.n] = self.a[: self.n]
            self.a = grown
        self.a[self.n : need] = values
        self.n = need

    def view(self) -> np.ndarray:
        return self.a[: self.n]


class FtsStore:
    INDEX_FILE = "index.msgpack"      # doc store (id → len, kind, path)
    POSTINGS_FILE = "postings.npz"    # CSR postings

    def __init__(self, directory: str | Path, readonly: bool = False):
        self.dir = Path(directory)
        self.readonly = readonly
        self._lock = threading.RLock()
        # doc store
        self._docs: dict[int, tuple[int, str, str]] = {}  # doc → (len, kind, path)
        # committed CSR postings
        self._uniq_terms = np.zeros(0, np.int64)
        self._offsets = np.zeros(1, np.int64)
        self._p_docs = np.zeros(0, np.int64)
        self._p_tfc = np.zeros(0, np.int32)
        self._p_tfs = np.zeros(0, np.int32)
        # uncommitted postings (appended since last commit)
        self._new_terms = _GrowBuf(np.int64)
        self._new_docs = _GrowBuf(np.int64)
        self._new_tfc = _GrowBuf(np.int32)
        self._new_tfs = _GrowBuf(np.int32)
        self._deleted: set[int] = set()
        self._dirty = False
        self._avg_len = 1.0
        # dense scoring view (rebuilt at merge): sorted live doc ids +
        # aligned lengths, so scoring is pure vectorized numpy
        self._doc_ids_sorted = np.zeros(0, np.int64)
        self._doc_len_arr = np.zeros(0, np.float32)
        if self.dir.exists():
            self._load()
        elif not readonly:
            self.dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def add_chunk(
        self,
        chunk_id: int,
        content: str,
        path: str,
        signature: str | None = None,
        kind: str = "",
    ) -> None:
        with self._lock:
            if chunk_id in self._docs:
                self.delete_chunk(chunk_id)
            c_keys = term_keys(content)
            s_keys = term_keys(signature or "")
            doc_len = len(c_keys) + len(s_keys)
            self._docs[chunk_id] = (max(doc_len, 1), kind, path)
            # per-term tf for this doc
            all_keys = np.concatenate([c_keys, s_keys]) if len(s_keys) else c_keys
            if len(all_keys) == 0:
                self._dirty = True
                return
            uniq, inv = np.unique(all_keys, return_inverse=True)
            tfc = np.zeros(len(uniq), np.int32)
            tfs = np.zeros(len(uniq), np.int32)
            np.add.at(tfc, inv[: len(c_keys)], 1)
            if len(s_keys):
                np.add.at(tfs, inv[len(c_keys):], 1)
            self._new_terms.extend(uniq)
            self._new_docs.extend(np.full(len(uniq), chunk_id, np.int64))
            self._new_tfc.extend(tfc)
            self._new_tfs.extend(tfs)
            self._dirty = True

    def delete_chunk(self, chunk_id: int) -> None:
        with self._lock:
            if chunk_id not in self._docs:
                return
            del self._docs[chunk_id]
            # committed postings die at merge via the tombstone set;
            # uncommitted postings purge immediately (so a subsequent re-add
            # of the same id — the replace path — survives the tombstone)
            self._deleted.add(chunk_id)
            if self._new_docs.n:
                keep = self._new_docs.view() != chunk_id
                if not keep.all():
                    for buf in (self._new_terms, self._new_docs,
                                self._new_tfc, self._new_tfs):
                        kept = buf.view()[keep]
                        buf.n = 0
                        buf.extend(kept)
            self._dirty = True

    def clear(self) -> None:
        with self._lock:
            self._docs = {}
            self._uniq_terms = np.zeros(0, np.int64)
            self._offsets = np.zeros(1, np.int64)
            self._p_docs = np.zeros(0, np.int64)
            self._p_tfc = np.zeros(0, np.int32)
            self._p_tfs = np.zeros(0, np.int32)
            self._new_terms = _GrowBuf(np.int64)
            self._new_docs = _GrowBuf(np.int64)
            self._new_tfc = _GrowBuf(np.int32)
            self._new_tfs = _GrowBuf(np.int32)
            self._deleted = set()
            self._avg_len = 1.0
            self.commit()

    def commit(self) -> None:
        """Merge new postings into CSR form + persist atomically."""
        if self.readonly:
            return
        with self._lock:
            self._merge()
            tmp = self.dir / (self.POSTINGS_FILE + ".tmp.npz")
            np.savez(
                tmp,
                uniq_terms=self._uniq_terms,
                offsets=self._offsets,
                p_docs=self._p_docs,
                p_tfc=self._p_tfc,
                p_tfs=self._p_tfs,
            )
            os.replace(tmp, self.dir / self.POSTINGS_FILE)
            tmp2 = self.dir / (self.INDEX_FILE + ".tmp")
            with open(tmp2, "wb") as f:
                msgpack.pack(
                    {"docs": {d: list(v) for d, v in self._docs.items()}, "version": 2},
                    f,
                )
            os.replace(tmp2, self.dir / self.INDEX_FILE)
            self._dirty = False

    def _merge(self) -> None:
        """Fold uncommitted postings + deletions into the CSR arrays."""
        has_new = self._new_terms.n > 0
        if not has_new and not self._deleted:
            self._recompute_avg_len()
            return
        # flatten CSR back to triples, drop tombstoned docs from the
        # COMMITTED part only (uncommitted buffers were purged at delete
        # time), append new, re-sort
        old_terms = np.repeat(self._uniq_terms, np.diff(self._offsets))
        old_docs, old_tfc, old_tfs = self._p_docs, self._p_tfc, self._p_tfs
        if self._deleted:
            dead = np.asarray(sorted(self._deleted), np.int64)
            keep = ~np.isin(old_docs, dead)
            old_terms = old_terms[keep]
            old_docs, old_tfc, old_tfs = old_docs[keep], old_tfc[keep], old_tfs[keep]
            self._deleted.clear()
        terms = np.concatenate([old_terms, self._new_terms.view()])
        docs = np.concatenate([old_docs, self._new_docs.view()])
        tfc = np.concatenate([old_tfc, self._new_tfc.view()])
        tfs = np.concatenate([old_tfs, self._new_tfs.view()])
        order = np.argsort(terms, kind="stable")
        terms, docs, tfc, tfs = terms[order], docs[order], tfc[order], tfs[order]
        self._uniq_terms, counts = np.unique(terms, return_counts=True)
        self._offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self._p_docs, self._p_tfc, self._p_tfs = docs, tfc, tfs
        self._new_terms = _GrowBuf(np.int64)
        self._new_docs = _GrowBuf(np.int64)
        self._new_tfc = _GrowBuf(np.int32)
        self._new_tfs = _GrowBuf(np.int32)
        self._recompute_avg_len()

    def _recompute_avg_len(self) -> None:
        if self._docs:
            self._avg_len = sum(l for l, _, _ in self._docs.values()) / len(self._docs)
            ids = np.fromiter(self._docs.keys(), np.int64, len(self._docs))
            order = np.argsort(ids)
            self._doc_ids_sorted = ids[order]
            lens = np.fromiter(
                (self._docs[int(d)][0] for d in self._doc_ids_sorted),
                np.float32, len(self._doc_ids_sorted),
            )
            self._doc_len_arr = lens
        else:
            self._avg_len = 1.0
            self._doc_ids_sorted = np.zeros(0, np.int64)
            self._doc_len_arr = np.zeros(0, np.float32)

    def _load(self) -> None:
        p = self.dir / self.INDEX_FILE
        if p.exists():
            try:
                with open(p, "rb") as f:
                    raw = msgpack.unpack(f, raw=False, strict_map_key=False)
                if raw.get("version") == 2:
                    self._docs = {int(d): tuple(v) for d, v in raw["docs"].items()}
                else:
                    log.info("fts index format v1 found — rebuild with `codesearch index --force`")
            except Exception as e:
                log.warning("corrupt fts doc store, starting empty: %s", e)
        pz = self.dir / self.POSTINGS_FILE
        if pz.exists():
            try:
                data = np.load(pz)
                self._uniq_terms = data["uniq_terms"]
                self._offsets = data["offsets"]
                self._p_docs = data["p_docs"]
                self._p_tfc = data["p_tfc"]
                self._p_tfs = data["p_tfs"]
            except Exception as e:
                log.warning("corrupt fts postings, starting empty: %s", e)
        self._recompute_avg_len()

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._docs)

    def _ensure_merged(self) -> None:
        with self._lock:
            if self._new_terms.n > 0 or self._deleted:
                self._merge()

    def _term_range(self, key: int) -> tuple[int, int]:
        i = int(np.searchsorted(self._uniq_terms, key))
        if i >= len(self._uniq_terms) or self._uniq_terms[i] != key:
            return 0, 0
        return int(self._offsets[i]), int(self._offsets[i + 1])

    def search(
        self,
        query: str,
        limit: int = 20,
        boost_kind: str | None = None,
    ) -> list[FtsResult]:
        self._ensure_merged()
        n = max(len(self._docs), 1)
        keys = np.unique(term_keys(query))
        if keys.size == 0 or self._doc_ids_sorted.size == 0:
            return []
        with self._lock:
            # dense vectorized accumulation over the sorted-live-doc view
            scores = np.zeros(len(self._doc_ids_sorted), np.float64)
            len_norm = _K1 * (1.0 - _B + _B * self._doc_len_arr / self._avg_len)
            for key in keys:
                lo, hi = self._term_range(int(key))
                if lo == hi:
                    continue
                df = hi - lo
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                docs = self._p_docs[lo:hi]
                tf = (self._p_tfc[lo:hi] + _SIG_BOOST * self._p_tfs[lo:hi]).astype(np.float64)
                pos = np.searchsorted(self._doc_ids_sorted, docs)
                contrib = idf * tf * (_K1 + 1.0) / (tf + len_norm[pos])
                np.add.at(scores, pos, contrib)
            if boost_kind:
                kinds = np.fromiter(
                    (self._docs[int(d)][1] == boost_kind for d in self._doc_ids_sorted),
                    bool, len(self._doc_ids_sorted),
                )
                scores = np.where(kinds, scores * _KIND_BOOST, scores)
            k = min(limit, int((scores > 0).sum()))
            if k == 0:
                return []
            top = np.argpartition(-scores, k - 1)[:k]
            top = top[np.argsort(-scores[top])]
            out = []
            for i in top:
                d = int(self._doc_ids_sorted[i])
                meta = self._docs[d]
                out.append(FtsResult(chunk_id=d, score=float(scores[i]),
                                     path=meta[2], kind=meta[1]))
            return out

    def search_exact(
        self,
        identifier: str,
        kind: str | None = None,
        limit: int = 20,
    ) -> list[FtsResult]:
        """Exact identifier lookup: signature hits boosted ×3 over content
        hits; AND-ed with kind when provided."""
        self._ensure_merged()
        toks = code_tokens(identifier)
        target = None
        for t in toks:
            if t.replace("_", "").isalnum() and ("_" in t or len(t) >= 3):
                if target is None or len(t) > len(target):
                    target = t
        if target is None:
            return []
        with self._lock:
            lo, hi = self._term_range(_to_i64(stable_u64(target)))
            if lo == hi:
                return []
            out: list[tuple[int, float]] = []
            docs = self._p_docs[lo:hi]
            tfc = self._p_tfc[lo:hi]
            tfs = self._p_tfs[lo:hi]
            for doc, c, s in zip(docs.tolist(), tfc.tolist(), tfs.tolist()):
                meta = self._docs.get(doc)
                if meta is None:
                    continue
                if kind is not None and meta[1] != kind:
                    continue
                score = _EXACT_SIG_BOOST * float(s) + float(c)
                if score > 0:
                    out.append((doc, score))
            out.sort(key=lambda kv: -kv[1])
            return [
                FtsResult(chunk_id=d, score=s, path=self._docs[d][2], kind=self._docs[d][1])
                for d, s in out[:limit]
            ]

    def stats(self) -> dict:
        with self._lock:
            disk = 0
            for f in (self.INDEX_FILE, self.POSTINGS_FILE):
                p = self.dir / f
                if p.exists():
                    disk += p.stat().st_size
            return {
                "docs": len(self._docs),
                "terms": int(len(self._uniq_terms)),
                "postings": int(len(self._p_docs)) + self._new_terms.n,
                "disk_bytes": disk,
            }
