"""Device/platform helpers for the axon-tunneled TPU environment.

The tunneled TPU backend has a large one-time initialization cost on the
FIRST device→host transfer of a process (observed 2-5 minutes). Nothing can
remove it, but it can overlap host-side work: ``start_transfer_warmup``
kicks a tiny round-trip on a daemon thread as soon as any device-using
component is constructed, so real readbacks later find the path warm.
"""

from __future__ import annotations

import threading

_warmup_lock = threading.Lock()
_warmup_thread: threading.Thread | None = None
_warmed = threading.Event()


def default_backend() -> str:
    import jax

    return jax.default_backend()


def _do_warmup() -> None:
    try:
        import jax.numpy as jnp
        import numpy as np

        np.asarray(jnp.zeros((1,), jnp.float32))
    except Exception:
        pass
    finally:
        _warmed.set()


def start_transfer_warmup() -> None:
    """Idempotent: start the first-transfer warmup in the background."""
    global _warmup_thread
    with _warmup_lock:
        if _warmup_thread is not None:
            return
        _warmup_thread = threading.Thread(
            target=_do_warmup, name="codesearch-transfer-warmup", daemon=True
        )
        _warmup_thread.start()


def wait_for_warmup(timeout: float | None = None) -> bool:
    start_transfer_warmup()
    return _warmed.wait(timeout)
