"""codesearch_tpu — a TPU-native semantic code search framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
``codesearch`` system (Rust + ONNX CPU + arroy/LMDB + tantivy): repo walking,
AST-aware chunking, batched on-device embedding, a device-resident vector
store searched by a fused matmul+top-k kernel, hybrid BM25 + RRF retrieval,
cross-encoder reranking, incremental indexing with a filesystem watcher, and
MCP/HTTP serving.

Architecture inversion vs the reference (see SURVEY.md §7): instead of
streaming file-by-file through a CPU model into an on-disk ANN, we batch
aggressively, keep the corpus resident on device, and answer queries with an
exact brute-force cosine top-k (one fused matmul), sharded over the ICI mesh
for large corpora. There is no ANN tree to build: ``build_index`` is O(1).
"""

__version__ = "0.1.0"

import os as _os


def _configure_jax() -> None:
    """Persistent XLA compilation cache: CLI invocations are short-lived
    processes and recompiles dominate cold-start on small hosts.

    Uses jax.config (not env vars) because some environments pre-import jax
    at interpreter startup, consuming env configuration before user code.
    """
    try:
        import jax

        if not jax.config.jax_compilation_cache_dir:
            # scope the cache per host CPU fingerprint: serialized
            # executables embed XLA:CPU AOT results compiled for the
            # writing host's CPU features — reloading them on a different
            # machine warns and can SIGILL
            import hashlib as _hashlib
            import platform as _platform

            host_key = _platform.machine() or "any"
            fingerprint = ""
            try:
                with open("/proc/cpuinfo") as _f:
                    fingerprint = next(
                        (ln for ln in _f if ln.startswith(("flags", "Features"))),
                        "",
                    )
            except OSError:
                pass
            if not fingerprint:
                # non-Linux fallback: uname (incl. hostname) — two machines
                # sharing a synced home must not share AOT entries
                fingerprint = "|".join(_platform.uname())
            host_key += "-" + _hashlib.sha256(
                fingerprint.encode()
            ).hexdigest()[:8]
            cache_root = _os.path.expanduser("~/.codesearch/jax_cache")
            # one-time cleanup: entries written by older builds sit flat in
            # cache_root (never read again after per-host scoping) — delete
            # regular files there so they don't pin disk forever
            try:
                for name in _os.listdir(cache_root):
                    p = _os.path.join(cache_root, name)
                    if _os.path.isfile(p):
                        _os.unlink(p)
            except OSError:
                pass
            jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.join(cache_root, host_key),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # XLA-internal AOT caches spam machine-feature mismatch errors on
        # reload and can SIGILL when the cache was written on a host with
        # different CPU features; the JAX-level executable cache is the one
        # that matters. Applied even when the environment pre-set a cache
        # dir (some rigs pre-import jax with their own).
        jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # jax misconfiguration must never break the CLI
        pass


_configure_jax()
