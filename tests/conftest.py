"""Test configuration.

Forces the JAX CPU backend with 8 virtual devices so multi-chip sharding
paths (Mesh/pjit/shard_map) are exercised without TPU hardware — the
standard substitute for a real pod slice (SURVEY.md §4).
Must run before any ``import jax``.
"""

import os

# NOTE: this environment's sitecustomize pre-imports jax with the axon
# (tunneled TPU) platform — env vars like JAX_PLATFORMS are consumed before
# user code runs. Only jax.config.update() reliably forces the CPU backend.
# XLA_FLAGS is still read lazily at CPU-client creation, so setting it here
# (before any computation) gives the 8-device virtual mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile
from pathlib import Path

import pytest

# Keep the global config dir (embedding caches, repo registry) inside a
# per-session tempdir so tests never touch the real home directory.
_config_tmp = tempfile.mkdtemp(prefix="codesearch-test-home-")
os.environ["CODESEARCH_HOME"] = _config_tmp


@pytest.fixture()
def tmp_repo(tmp_path: Path) -> Path:
    """A small multi-language source tree for walker/chunker/index tests."""
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "main.py").write_text(
        '''"""Demo module."""

import os


def parse_config(path):
    """Parse the configuration file."""
    with open(path) as f:
        return f.read()


class Indexer:
    """Builds the search index."""

    def __init__(self, root):
        self.root = root

    def run(self):
        return [parse_config(self.root)]
'''
    )
    (tmp_path / "src" / "lib.rs").write_text(
        """//! Library crate.

use std::path::Path;

/// Compute a content hash.
pub fn content_hash(data: &[u8]) -> u64 {
    let mut h = 0u64;
    for b in data {
        h = h.wrapping_mul(31).wrapping_add(*b as u64);
    }
    h
}

pub struct Walker {
    root: String,
}

impl Walker {
    pub fn new(root: &str) -> Self {
        Self { root: root.to_string() }
    }
}
"""
    )
    (tmp_path / "README.md").write_text("# Demo\n\nA demo repo.\n")
    (tmp_path / ".gitignore").write_text("ignored_dir/\n*.log\n")
    (tmp_path / "ignored_dir").mkdir()
    (tmp_path / "ignored_dir" / "skipme.py").write_text("x = 1\n")
    (tmp_path / "debug.log").write_text("log line\n")
    (tmp_path / "image.png").write_bytes(b"\x89PNG\x00\x00\x00binary")
    return tmp_path
