"""Contrastive (InfoNCE) training of the encoder over a (data, model) mesh.

The reference has no training at all — embedding models arrive frozen from
ONNX. A TPU-native framework can fine-tune its encoder on (query, code)
pairs mined from the indexed corpus (docstring ↔ body, signature ↔ body).
This module provides the sharded training step:

- **DP**: the pair batch shards over the "data" axis; in-batch negatives
  span the global batch (XLA inserts the all-gather for the [B, B] logits).
- **TP**: attention/MLP weights shard over the "model" axis (column-parallel
  in-projection, row-parallel out-projection) via NamedSharding constraints;
  XLA places the psum where the row-parallel matmul closes.

This is also the framework's multi-chip dry-run workload
(__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.encoder import encode, init_params
from ..models.registry import ArchConfig


def _rule_for(path: tuple, leaf) -> P:
    """Partition rule by parameter name (column/row parallel on "model")."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    name = names[-1] if names else ""
    if name in ("q_w", "k_w", "v_w", "mlp_in_w"):
        return P(None, "model")          # column parallel
    if name in ("o_w", "mlp_out_w"):
        return P("model", None)          # row parallel
    if name in ("q_b", "k_b", "v_b", "mlp_in_b"):
        return P("model")
    if name == "word":
        return P("model", None)          # vocab-sharded embedding table
    return P()                            # replicated (LN, positions, o_b…)


def param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _rule_for(path, leaf)), params
    )


def make_sharded_train_state(
    cfg: ArchConfig, mesh: Mesh, rng, learning_rate: float = 1e-4
):
    """Init params + optimizer state, placed with tp shardings."""
    params = init_params(rng, cfg)
    shardings = param_shardings(params, mesh)
    params = jax.tree.map(jax.device_put, params, shardings)
    tx = optax.adamw(learning_rate)
    opt_state = tx.init(params)
    return params, opt_state, tx


def info_nce_loss(params, batch, cfg: ArchConfig, temperature: float = 0.05):
    """Symmetric InfoNCE over in-batch negatives."""
    q_emb = encode(params, batch["query_ids"], batch["query_mask"], cfg)
    d_emb = encode(params, batch["doc_ids"], batch["doc_mask"], cfg)
    logits = (q_emb @ d_emb.T) / temperature              # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_qd + loss_dq) / 2.0


def make_train_step(cfg: ArchConfig, mesh: Mesh, tx):
    """Jitted train step with dp batch sharding + tp param sharding."""
    batch_sharding = NamedSharding(mesh, P("data", None))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, {k: batch_sharding for k in batch}
        )
        loss, grads = jax.value_and_grad(info_nce_loss)(params, batch, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
