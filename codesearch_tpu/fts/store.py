"""BM25 full-text store.

Replaces tantivy (src/fts/tantivy_store.rs): code-aware tokenization feeds an
in-memory postings index (term → [(doc, tf_content, tf_signature)]) that is
vectorized to numpy arrays at commit for fast scoring, and persisted as one
msgpack blob with atomic replace (the NoMergePolicy/`writer was killed`
machinery disappears — there is no background merge thread to crash).

Query semantics parity:
- ``search``: BM25 with signature terms boosted ×2 and a ×3 score boost for
  chunks matching a structural-intent kind (tantivy_store.rs:394-458).
- ``search_exact``: identifier term matched in signature (boost ×3) ∪
  content, AND-ed with kind when both identifier and kind are present
  (tantivy_store.rs:460-524).

Fusion only consumes ranks (RRF), so absolute score scale differences from
tantivy are immaterial.
"""

from __future__ import annotations

import math
import os
import threading
from collections import Counter
from dataclasses import dataclass
from pathlib import Path

import msgpack
import numpy as np

from ..models.tokenizer import code_tokens
from ..utils.hashing import stable_u64
from ..utils.logger import get_logger

log = get_logger("fts")


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

_K1 = 1.2
_B = 0.75
_SIG_BOOST = 2.0
_KIND_BOOST = 3.0
_EXACT_SIG_BOOST = 3.0


@dataclass
class FtsResult:
    chunk_id: int
    score: float
    path: str
    kind: str


class FtsStore:
    INDEX_FILE = "index.msgpack"

    def __init__(self, directory: str | Path, readonly: bool = False):
        self.dir = Path(directory)
        self.readonly = readonly
        self._lock = threading.RLock()
        # live (uncommitted) state
        self._postings: dict[str, list[tuple[int, int, int]]] = {}
        self._docs: dict[int, tuple[int, str, str]] = {}  # doc → (len, kind, path)
        self._dirty = False
        self._deletes_pending = 0
        # committed numpy view for scoring
        self._np_postings: dict[str, np.ndarray] | None = None
        self._avg_len = 1.0
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
            c_tf = Counter(term_keys(content).tolist())
            s_tf = Counter(term_keys(signature or "").tolist())
            doc_len = sum(c_tf.values()) + sum(s_tf.values())
            self._docs[chunk_id] = (max(doc_len, 1), kind, path)
            for term in set(c_tf) | set(s_tf):
                self._postings.setdefault(term, []).append(
                    (chunk_id, c_tf.get(term, 0), s_tf.get(term, 0))
                )
            self._dirty = True
            self._np_postings = None

    def delete_chunk(self, chunk_id: int) -> None:
        with self._lock:
            if chunk_id not in self._docs:
                return
            del self._docs[chunk_id]
            # lazy: postings rows for dead docs are filtered at scoring/vacuum
            self._dirty = True
            self._deletes_pending += 1
            self._np_postings = None

    def clear(self) -> None:
        with self._lock:
            self._postings = {}
            self._docs = {}
            self._np_postings = None
            self._dirty = True
            self.commit()

    def commit(self) -> None:
        """Vectorize + persist atomically (analog of tantivy commit)."""
        if self.readonly:
            return
        with self._lock:
            self._vacuum()
            self._build_np()
            tmp = self.dir / (self.INDEX_FILE + ".tmp")
            payload = {
                "docs": {d: list(v) for d, v in self._docs.items()},
                "postings": self._postings,
                "version": 1,
            }
            with open(tmp, "wb") as f:
                msgpack.pack(payload, f)
            os.replace(tmp, self.dir / self.INDEX_FILE)
            self._dirty = False

    def _vacuum(self) -> None:
        """Drop postings rows for deleted docs (skipped when none pending —
        periodic mid-index commits must stay O(new docs), not O(corpus))."""
        if not self._deletes_pending:
            return
        live = self._docs.keys()
        new_postings = {}
        for term, rows in self._postings.items():
            kept = [r for r in rows if r[0] in live]
            if kept:
                new_postings[term] = kept
        self._postings = new_postings
        self._deletes_pending = 0

    def _load(self) -> None:
        p = self.dir / self.INDEX_FILE
        if not p.exists():
            return
        try:
            with open(p, "rb") as f:
                raw = msgpack.unpack(f, raw=False, strict_map_key=False)
            self._docs = {int(d): tuple(v) for d, v in raw["docs"].items()}
            self._postings = {
                t: [tuple(r) for r in rows] for t, rows in raw["postings"].items()
            }
        except Exception as e:
            log.warning("corrupt fts index, rebuilding empty: %s", e)
            self._docs, self._postings = {}, {}
        self._np_postings = None

    def _build_np(self) -> None:
        self._np_postings = {
            term: np.asarray(rows, np.int64).reshape(-1, 3)
            for term, rows in self._postings.items()
        }
        if self._docs:
            self._avg_len = sum(l for l, _, _ in self._docs.values()) / len(self._docs)
        else:
            self._avg_len = 1.0
        self._doc_len = {d: v[0] for d, v in self._docs.items()}

    def _np(self) -> dict[str, np.ndarray]:
        with self._lock:
            if self._np_postings is None:
                self._vacuum()
                self._build_np()
            return self._np_postings

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self._docs)

    def search(
        self,
        query: str,
        limit: int = 20,
        boost_kind: str | None = None,
    ) -> list[FtsResult]:
        postings = self._np()
        n = max(len(self._docs), 1)
        terms = set(term_keys(query).tolist())
        if not terms:
            return []
        scores: dict[int, float] = {}
        for term in terms:
            rows = postings.get(term)
            if rows is None:
                continue
            df = rows.shape[0]
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            for doc, tf_c, tf_s in rows:
                doc = int(doc)
                meta = self._docs.get(doc)
                if meta is None:
                    continue
                dl = meta[0]
                tf = tf_c + _SIG_BOOST * tf_s
                denom = tf + _K1 * (1.0 - _B + _B * dl / self._avg_len)
                scores[doc] = scores.get(doc, 0.0) + idf * tf * (_K1 + 1.0) / denom
        if boost_kind:
            for doc in list(scores):
                if self._docs[doc][1] == boost_kind:
                    scores[doc] *= _KIND_BOOST
        ranked = sorted(scores.items(), key=lambda kv: -kv[1])[:limit]
        return [
            FtsResult(chunk_id=d, score=s, path=self._docs[d][2], kind=self._docs[d][1])
            for d, s in ranked
        ]

    def search_exact(
        self,
        identifier: str,
        kind: str | None = None,
        limit: int = 20,
    ) -> list[FtsResult]:
        """Exact identifier lookup: signature hits boosted ×3 over content
        hits; AND-ed with kind when provided."""
        postings = self._np()
        terms = code_tokens(identifier)
        # the whole-identifier token carries the exact-match signal
        target = None
        for t in terms:
            if t.replace("_", "").isalnum() and ("_" in t or len(t) >= 3):
                if target is None or len(t) > len(target):
                    target = t
        if target is None:
            return []
        rows = postings.get(_to_i64(stable_u64(target)))
        if rows is None:
            return []
        scores: dict[int, float] = {}
        for doc, tf_c, tf_s in rows:
            doc = int(doc)
            meta = self._docs.get(doc)
            if meta is None:
                continue
            if kind is not None and meta[1] != kind:
                continue
            score = 0.0
            if tf_s > 0:
                score += _EXACT_SIG_BOOST * float(tf_s)
            if tf_c > 0:
                score += float(tf_c)
            if score > 0:
                scores[doc] = score
        ranked = sorted(scores.items(), key=lambda kv: -kv[1])[:limit]
        return [
            FtsResult(chunk_id=d, score=s, path=self._docs[d][2], kind=self._docs[d][1])
            for d, s in ranked
        ]

    def stats(self) -> dict:
        return {
            "docs": len(self._docs),
            "terms": len(self._postings),
            "disk_bytes": (
                (self.dir / self.INDEX_FILE).stat().st_size
                if (self.dir / self.INDEX_FILE).exists()
                else 0
            ),
        }
