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


def error_print(*args: object) -> None:
    """Errors always go to stderr, even in quiet mode."""
    print("error:", *args, file=sys.stderr)


def result_print(s: str) -> None:
    """Results go to stdout — the only sanctioned stdout writer."""
    sys.stdout.write(s)
    if not s.endswith("\n"):
        sys.stdout.write("\n")
    sys.stdout.flush()
