"""Shared background first-search warmup for the serving layer.

The first real query pays the fused-dispatch jit compile (~20-40s) plus the
tunneled-TPU first-transfer init (minutes); both servers pre-pay them by
firing one throwaway search once the initial refresh populates the stores.

Discipline:
- the store-population poll takes ``stores.lock`` only for the length peek —
  the warmup dispatch itself runs WITHOUT the coarse stores lock (the stores'
  internal RLocks make it safe), so /status and the background refresher are
  never blocked behind a multi-minute tunnel init;
- the caller's ``fire`` thunk must use the SAME static shapes (k, limits) as
  a default real query — k is a static argname on the jitted pipelines, so
  warming a different k compiles a different executable and pre-pays nothing.
"""

from __future__ import annotations

import threading
import time

from ..utils.logger import get_logger

log = get_logger("warmup")


def start_search_warmup(stores, fire, timeout_s: float = 600.0) -> threading.Thread:
    """Run ``fire()`` on a daemon thread once ``stores.store`` has rows
    (or the timeout passes). Failures only log."""

    def _warm():
        try:
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                with stores.lock:
                    n = len(stores.store)
                if n:
                    break
                time.sleep(1.0)
            fire()
            log.info("search warmup complete")
        except Exception:
            log.exception("search warmup failed")

    t = threading.Thread(target=_warm, daemon=True, name="search-warmup")
    t.start()
    return t
