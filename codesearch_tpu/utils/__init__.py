"""Cross-cutting utilities: constants, errors, output control, logging, hashing."""

from . import constants  # noqa: F401
from .errors import CodeSearchError  # noqa: F401
from .hashing import sha256_hex  # noqa: F401
from .output import info_print, warn_print, error_print, set_quiet, is_quiet  # noqa: F401


def group_chunks_by_path(chunks):
    """Group chunk-like objects by their .path (reference: utils/mod.rs:19-80)."""
    out: dict[str, list] = {}
    for c in chunks:
        out.setdefault(c.path, []).append(c)
    return out
