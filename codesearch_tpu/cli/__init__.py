"""CLI parity with the reference (src/cli/mod.rs:54-395): search / index /
serve / stats / clear / doctor / setup / mcp / cache, global flags
--loglevel / --quiet / --store / --model."""

from .main import main  # noqa: F401
