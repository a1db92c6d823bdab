"""Mesh construction helpers.

The retrieval workload shards the *corpus* dimension over ICI ("data" axis);
training adds a "model" (tensor-parallel) axis. SURVEY.md §2.2: DP over ICI
is required, TP is stretch; PP/SP/EP are N/A for 512-token encoders.
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None):
    """Build a Mesh with axes ("data", "model").

    Defaults to all available devices on the data axis.
    """
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    use = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(use, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# product-wide corpus mesh (single-axis, all devices)
# ---------------------------------------------------------------------------
# VectorStore and the embedding backends consult this to decide placement, so
# on a v5e-8 the CLI/MCP/HTTP paths automatically shard the corpus and the
# embed batches over ICI — a single chip is just the None case.

_corpus_mesh = None
_corpus_mesh_tried = False


def corpus_mesh():
    """The mesh the product shards over: all devices on one "data" axis,
    or None on a single device / when CODESEARCH_SINGLE_DEVICE=1."""
    global _corpus_mesh, _corpus_mesh_tried
    if _corpus_mesh_tried:
        return _corpus_mesh
    _corpus_mesh_tried = True
    import os

    if os.environ.get("CODESEARCH_SINGLE_DEVICE"):
        return None
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if len(devices) < 2:
        return None
    _corpus_mesh = Mesh(np.array(devices), axis_names=("data",))
    return _corpus_mesh


def reset_corpus_mesh() -> None:
    """Testing hook: re-evaluate device availability / env overrides."""
    global _corpus_mesh, _corpus_mesh_tried
    _corpus_mesh = None
    _corpus_mesh_tried = False
