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
