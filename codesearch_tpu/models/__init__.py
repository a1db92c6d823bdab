"""Models: registry, tokenizers, JAX BERT encoder, weights-free hash embedder."""

from .registry import (  # noqa: F401
    DEFAULT_MODEL,
    MODELS,
    ArchConfig,
    ModelSpec,
    all_models,
    parse_model,
)
