"""Quiet-mode aware console output.

stdout is reserved for results and JSON-RPC frames (the MCP server speaks
JSON-RPC over stdout); all human-facing chatter goes to stderr and is
suppressed entirely in quiet mode. Mirrors the reference's output discipline
(src/output.rs:96-141) — a source-scanning test asserts no stray ``print``
calls in server/search modules.
"""

from __future__ import annotations

import sys
import threading

_QUIET = False
_LOCK = threading.Lock()


def set_quiet(quiet: bool) -> None:
    global _QUIET
    with _LOCK:
        _QUIET = quiet


def is_quiet() -> bool:
    return _QUIET


def info_print(*args: object) -> None:
    """Informational message → stderr, suppressed in quiet mode."""
    if not _QUIET:
        print(*args, file=sys.stderr)


def warn_print(*args: object) -> None:
    """Warning → stderr, suppressed in quiet mode."""
    if not _QUIET:
        print("warning:", *args, file=sys.stderr)


class ProgressLine:
    """Single-line progress display on stderr (the analog of the
    reference's indicatif bar, index/mod.rs:573-798): carriage-return
    updates on a tty, periodic plain lines otherwise, nothing in quiet
    mode. ``finish`` clears the line so the summary prints clean."""

    def __init__(self, total: int, label: str = "indexing"):
        self.total = total
        self.label = label
        self._tty = sys.stderr.isatty()
        self._last_plain = 0.0

    def update(self, done: int, extra: str = "") -> None:
        if _QUIET or self.total <= 0:
            return
        import time as _t

        pct = 100.0 * done / self.total
        msg = f"{self.label}: {done}/{self.total} files ({pct:.0f}%){extra}"
        if self._tty:
            sys.stderr.write("\r\x1b[2K" + msg)
            sys.stderr.flush()
        else:
            now = _t.monotonic()
            if now - self._last_plain >= 5.0 or done == self.total:
                self._last_plain = now
                print(msg, file=sys.stderr)

    def finish(self) -> None:
        if not _QUIET and self._tty:
            sys.stderr.write("\r\x1b[2K")
            sys.stderr.flush()


def error_print(*args: object) -> None:
    """Errors always go to stderr, even in quiet mode."""
    print("error:", *args, file=sys.stderr)


def result_print(s: str) -> None:
    """Results go to stdout — the only sanctioned stdout writer."""
    sys.stdout.write(s)
    if not s.endswith("\n"):
        sys.stdout.write("\n")
    sys.stdout.flush()
