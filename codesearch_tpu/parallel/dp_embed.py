"""Data-parallel embedding over the device mesh.

SURVEY.md §2.2 row "DP": chunk batches shard across the "data" axis for
embedding — the multi-chip analog of the reference's single-threaded CPU
embed loop. Inputs pad to a multiple of the axis size; each device encodes
its slice; results gather back to host in one transfer.

Works for both backends:
- hash model: shard (ids, weights) batches; the table replicates.
- BERT encoder: shard (input_ids, mask); params replicate (the tp variant
  lives in train.contrastive's shardings).
"""

from __future__ import annotations

import numpy as np


def dp_embed_features(table, ids: np.ndarray, weights: np.ndarray, mesh,
                      half_transfer: bool = False) -> np.ndarray:
    """Hash-model embed with the batch sharded over mesh axis "data".

    ``half_transfer`` converts to fp16 on device before the gather back to
    host (bulk indexing quantizes rows to fp16 at store insert anyway)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.hash_embedder import embed_features

    n = ids.shape[0]
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    if pad:
        ids = np.concatenate([ids, np.zeros((pad, ids.shape[1]), ids.dtype)])
        weights = np.concatenate([weights, np.zeros((pad, weights.shape[1]), weights.dtype)])
    batch_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    ids_d = jax.device_put(jnp.asarray(ids), batch_sh)
    w_d = jax.device_put(jnp.asarray(weights), batch_sh)
    table_d = jax.device_put(table, repl)
    out = embed_features(table_d, ids_d, w_d)
    if half_transfer:
        out = out.astype(jnp.float16)
    return np.asarray(out, np.float32)[:n]


def dp_encode(params, input_ids: np.ndarray, attention_mask: np.ndarray, cfg, mesh) -> np.ndarray:
    """BERT encode with the batch sharded over mesh axis "data"."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.encoder import encode

    n = input_ids.shape[0]
    n_dev = mesh.shape["data"]
    pad = (-n) % n_dev
    if pad:
        input_ids = np.concatenate(
            [input_ids, np.zeros((pad, input_ids.shape[1]), input_ids.dtype)]
        )
        attention_mask = np.concatenate(
            [attention_mask, np.ones((pad, attention_mask.shape[1]), attention_mask.dtype)]
        )
    batch_sh = NamedSharding(mesh, P("data", None))
    repl = NamedSharding(mesh, P())
    ids_d = jax.device_put(jnp.asarray(input_ids), batch_sh)
    mask_d = jax.device_put(jnp.asarray(attention_mask), batch_sh)
    params_d = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    out = encode(params_d, ids_d, mask_d, cfg)
    return np.asarray(out)[:n]
