"""Multi-device sharded vector search over a VectorStore's corpus.

Wraps a host-side VectorStore with mesh-sharded device placement: the row
dimension shards across the "data" axis (rows padded to a multiple of the
axis size with valid=False), and queries answer via the exact sharded
top-k (local top-k + all_gather merge). Use when ≥2 devices are available;
single-chip stores use VectorStore's own device path.
"""

from __future__ import annotations

import numpy as np

from ..utils.logger import get_logger
from ..vectordb.store import SearchResult, VectorStore

log = get_logger("sharded_store")


class ShardedSearcher:
    """Read-side accelerator over a VectorStore snapshot on a mesh."""

    def __init__(self, store: VectorStore, mesh=None):
        import jax

        from .mesh import make_mesh
        from .sharded_search import shard_corpus

        self.store = store
        self.mesh = mesh or make_mesh(n_data=len(jax.devices()), n_model=1)
        n_shards = self.mesh.shape["data"]

        import jax.numpy as jnp

        with store._lock:
            rows = store._rows_range(0, store._rows)
            valid = store._used_valid().copy()
        n = rows.shape[0]
        pad = (-n) % max(n_shards, 1)
        if pad:
            rows = np.concatenate([rows, np.zeros((pad, store.dims), np.float32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        self._n_rows = n
        self.corpus, self.valid = shard_corpus(
            jnp.asarray(rows, jnp.bfloat16), jnp.asarray(valid), self.mesh
        )

    def search_batch(self, query_vecs: np.ndarray, limit: int) -> list[list[SearchResult]]:
        import jax.numpy as jnp

        from .sharded_search import sharded_cosine_topk

        if query_vecs.ndim == 1:
            query_vecs = query_vecs[None, :]
        if self._n_rows == 0:
            return [[] for _ in range(query_vecs.shape[0])]
        k = min(limit, self._n_rows)
        vals, idx = sharded_cosine_topk(
            jnp.asarray(query_vecs, jnp.float32), self.corpus, self.valid, k, self.mesh
        )
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        out: list[list[SearchResult]] = []
        with self.store._lock:
            cids = self.store._cids.view()
            valid = self.store._valid.view()
            for qi in range(vals.shape[0]):
                results = []
                for score, row in zip(vals[qi], idx[qi]):
                    if score < -1e29 or row >= len(cids) or not valid[row]:
                        continue
                    meta = self.store._fetch_meta(int(row))
                    if meta is None:
                        continue
                    results.append(SearchResult(
                        chunk_id=int(cids[row]), score=float(score), metadata=meta))
                out.append(results)
        return out
