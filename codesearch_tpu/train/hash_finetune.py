"""Contrastive fine-tuning of the hash-embedder table.

The weights-free ``code-hash-*`` models are a single [buckets, d] table —
a trainable embedding matrix. Fine-tuning on pairs mined from the indexed
corpus (train.data.mine_pairs) aligns query vocabulary with code vocabulary
(e.g. docstring words ↔ identifier subwords), which pure random projection
cannot do. InfoNCE with in-batch negatives, full-batch device steps.
"""

from __future__ import annotations

import functools

import numpy as np

from ..models.hash_embedder import MAX_TOKENS, batch_features
from ..utils.logger import get_logger
from .data import Pair

log = get_logger("hash_finetune")


def _featurize_pairs(pairs: list[Pair], max_tokens: int = 128):
    q_ids, q_ws = batch_features([p.query for p in pairs], max_tokens)
    d_ids, d_ws = batch_features([p.doc for p in pairs], max_tokens)
    return q_ids, q_ws, d_ids, d_ws


def finetune_table(
    table,
    pairs: list[Pair],
    epochs: int = 20,
    batch_size: int = 64,
    learning_rate: float = 0.5,
    temperature: float = 0.1,
    seed: int = 0,
):
    """Returns (trained table f32→orig dtype, list of per-epoch losses)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.hash_embedder import embed_features

    if len(pairs) < 4:
        return table, []

    def loss_fn(tbl, q_ids, q_ws, d_ids, d_ws):
        q = embed_features(tbl, q_ids, q_ws)
        d = embed_features(tbl, d_ids, d_ws)
        logits = (q @ d.T) / temperature
        labels = jnp.arange(logits.shape[0])
        l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        return jnp.mean(l_qd + l_dq) / 2.0

    tx = optax.adam(learning_rate)
    tbl = jnp.asarray(table, jnp.float32)
    opt_state = tx.init(tbl)

    @jax.jit
    def step(tbl, opt_state, q_ids, q_ws, d_ids, d_ws):
        loss, grads = jax.value_and_grad(loss_fn)(tbl, q_ids, q_ws, d_ids, d_ws)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(tbl, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses = []
    # fixed batch shape: pad/trim each epoch's batches to batch_size
    eff_bs = min(batch_size, len(pairs))
    for epoch in range(epochs):
        order = rng.permutation(len(pairs))
        epoch_losses = []
        for i in range(0, len(order) - eff_bs + 1, eff_bs):
            batch = [pairs[j] for j in order[i : i + eff_bs]]
            q_ids, q_ws, d_ids, d_ws = _featurize_pairs(batch)
            tbl, opt_state, loss = step(
                tbl, opt_state,
                jnp.asarray(q_ids), jnp.asarray(q_ws),
                jnp.asarray(d_ids), jnp.asarray(d_ws),
            )
            epoch_losses.append(float(loss))
        if epoch_losses:
            losses.append(float(np.mean(epoch_losses)))
    log.info("hash finetune: %d pairs, loss %.4f → %.4f",
             len(pairs), losses[0] if losses else 0, losses[-1] if losses else 0)
    return tbl.astype(table.dtype), losses
