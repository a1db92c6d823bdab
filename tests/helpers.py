"""Test helpers: a real-git repo harness (reference: tests/helpers/mod.rs).

TestRepo creates a real ``git init`` repository in a tempdir with commits,
branches, and checkouts — used to exercise branch-switch refresh without a
daemon.
"""

from __future__ import annotations

import subprocess
from pathlib import Path


class TestRepo:
    __test__ = False  # not a pytest test class

    def __init__(self, root: Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self._git("init", "-q", "-b", "main")
        self._git("config", "user.email", "test@test")
        self._git("config", "user.name", "test")

    def _git(self, *args: str) -> str:
        out = subprocess.run(
            ["git", *args], cwd=self.root, capture_output=True, text=True,
        )
        if out.returncode != 0:
            raise RuntimeError(
                f"git {' '.join(args)} failed: {out.stderr.strip()!r}"
            )
        return out.stdout

    def write(self, rel: str, content: str) -> Path:
        p = self.root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(content)
        return p

    def commit_all(self, message: str = "commit") -> None:
        self._git("add", "-A")
        self._git("commit", "-q", "-m", message, "--allow-empty")

    def create_branch(self, name: str, changes: dict[str, str | None]) -> None:
        """Branch from current HEAD applying ``changes`` (None = delete)."""
        self._git("checkout", "-q", "-b", name)
        for rel, content in changes.items():
            if content is None:
                (self.root / rel).unlink(missing_ok=True)
            else:
                self.write(rel, content)
        self.commit_all(f"branch {name}")

    def checkout(self, name: str) -> None:
        self._git("checkout", "-q", name)

    def head_content(self) -> str:
        return (self.root / ".git" / "HEAD").read_text()
