"""Device-OOM degrade shared by the session pipeline and the serving
read plane: classify a dispatch failure as HBM exhaustion and, when it
is, release the resident BM25 score planes and retry the dispatch once
on the allocation-light sparse leg (ref behavior analog: the reference's
LMDB MDB_MAP_FULL resize-and-retry loop, /root/reference/src/vectordb/
store.rs:252-328 — degrade and continue rather than fail the query)."""

from __future__ import annotations

from ..utils.logger import get_logger

log = get_logger("search")


def is_device_oom(e: Exception) -> bool:
    """True for an XLA out-of-device-memory error. Matched textually:
    jax surfaces them as JaxRuntimeError/XlaRuntimeError whose class
    hierarchy moves between versions, but the status name is stable.
    RESOURCE_EXHAUSTED alone is not enough on this rig — the tunneled
    backend reuses the status for gRPC quota/message-size errors, and
    treating those as HBM pressure would permanently disable score
    planes — so a memory-ish keyword must also be present."""
    msg = str(e)
    if "RESOURCE_EXHAUSTED" not in msg and "Resource exhausted" not in msg:
        return False
    low = msg.lower()
    return any(w in low for w in ("memory", "hbm", "allocat", "bytes"))


def dispatch_with_degrade(fts, fn, what: str):
    """Run ``fn()``; on a device OOM with score planes still enabled,
    release the planes and run it once more (high-df terms re-route to
    the bounded sparse leg or the host BM25 fallback). Anything else —
    including a second OOM — propagates. ``fts`` may be None (no FTS
    store in play: nothing to release, so nothing to retry)."""
    try:
        return fn()
    except Exception as e:
        if fts is None or not is_device_oom(e) or not fts.planes_enabled:
            raise
        # HBM pressure (observed first at 10M rows: 6.4 GB int8 matrix
        # + resident postings + the [rows, ncap] plane buffer + a
        # non-donated transient copy per plane build can crowd out a
        # fresh executable's workspace). Degrade instead of dying; planes
        # stay off for the rest of the process (diagnosable via
        # `codesearch stats` plane fields and this warning).
        log.warning(
            "device RESOURCE_EXHAUSTED during %s — releasing score "
            "planes and retrying on the sparse BM25 leg: %s",
            what,
            str(e).splitlines()[0] if str(e) else type(e).__name__,
        )
        fts.release_planes()
        return fn()
