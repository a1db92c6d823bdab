"""File walker demo (reference: examples/file_walker_demo.rs)."""

from __future__ import annotations

import sys
from pathlib import Path


def main() -> int:
    root = Path(sys.argv[1] if len(sys.argv) > 1 else ".")
    from codesearch_tpu.fileio import FileWalker

    files, stats = FileWalker(root).walk()
    for f in files[:40]:
        print(f"{f.language.display_name:12s} {f.size:8d}  {f.path}")
    if len(files) > 40:
        print(f"... and {len(files) - 40} more")
    print(f"\nindexable: {stats.indexed}  seen: {stats.total_seen}  "
          f"binary-skipped: {stats.skipped_binary}  ignored: {stats.skipped_ignored}")
    print("by language:", dict(sorted(stats.by_language.items(), key=lambda kv: -kv[1])))
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
