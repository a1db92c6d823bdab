"""TPU ops: Pallas kernels and XLA reference implementations.

Every op ships two paths: an XLA-composed reference (always correct, used on
CPU test meshes and as the fallback) and a Pallas TPU kernel for the hot
path. Dispatch is by backend platform; kernels are validated against the
references in tests (interpret mode on CPU).
"""

from .attention import fused_encoder_attention  # noqa: F401
from .topk import cosine_topk  # noqa: F401
