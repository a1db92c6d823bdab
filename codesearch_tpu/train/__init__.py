"""Training: contrastive fine-tuning of the embedding encoder on a mesh."""

from .contrastive import (  # noqa: F401
    make_sharded_train_state,
    make_train_step,
    param_shardings,
)
