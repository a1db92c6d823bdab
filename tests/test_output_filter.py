"""fd-level native-log spam filter (utils/output.py).

XLA's AOT-cache loader logs a ~6KB spurious machine-feature-mismatch error
per persistent-cache hit on the CPU backend; the TSL log threshold latches
before user code in pre-imported-jax environments, so the CLI filters the
specific lines at the file-descriptor level. These tests drive the real fd
plumbing against a tempfile standing in for the terminal. The redirect
must happen INSIDE the test body (a fixture's fd-2 redirect is undone when
pytest's capture manager re-attaches at the setup→call phase boundary),
hence the context manager instead of a fixture.
"""

import contextlib
import os

from codesearch_tpu.utils.output import (
    NATIVE_SPAM_PATTERNS,
    _might_be_spam_prefix,
    install_native_log_filter,
    stderr_isatty,
    uninstall_native_log_filter,
)

SPAM = (
    b"E0818 01:52:07.357736 8967 cpu_aot_loader.cc:210] Loading XLA:CPU "
    b"AOT result. Target machine feature +prefer-no-scatter is not "
    b"supported on the host machine.\n"
)


@contextlib.contextmanager
def fd2_to(sink):
    """Point fd 2 at ``sink`` for the block, restoring the original fd 2
    (and tearing down any leftover filter) afterwards. Earlier tests may
    have installed the process-global filter through cli.main() — clear it
    first so install() inside the block binds to OUR sink."""
    uninstall_native_log_filter()
    fd = os.open(sink, os.O_CREAT | os.O_WRONLY)
    saved = os.dup(2)
    os.dup2(fd, 2)
    os.close(fd)
    try:
        yield
    finally:
        uninstall_native_log_filter()
        os.dup2(saved, 2)
        os.close(saved)


class TestNativeLogFilter:
    def test_spam_dropped_real_lines_pass(self, tmp_path):
        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            os.write(2, SPAM)
            os.write(2, b"error: something real\n")
            os.write(2, SPAM)
            uninstall_native_log_filter()
        out = sink.read_bytes()
        assert b"cpu_aot_loader" not in out
        assert b"error: something real\n" in out

    def test_partial_progress_writes_stream_through(self, tmp_path):
        import time

        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            # carriage-return progress updates carry no newline; they must
            # be forwarded promptly, not held until the line completes
            os.write(2, b"\r\x1b[2Kindexing: 5/10 files (50%)")
            deadline = time.monotonic() + 2.0
            seen = False
            while time.monotonic() < deadline and not seen:
                seen = b"indexing: 5/10" in sink.read_bytes()
                time.sleep(0.01)
            assert seen
            uninstall_native_log_filter()

    def test_spam_split_across_writes_still_dropped(self, tmp_path):
        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            os.write(2, SPAM[:40])  # ends inside the pattern region
            os.write(2, SPAM[40:])
            os.write(2, b"after\n")
            uninstall_native_log_filter()
        out = sink.read_bytes()
        assert b"cpu_aot_loader" not in out
        assert b"after\n" in out

    def test_install_is_idempotent(self, tmp_path):
        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            install_native_log_filter()
            os.write(2, b"once\n")
            uninstall_native_log_filter()
            uninstall_native_log_filter()  # second uninstall is a no-op
        assert sink.read_bytes().count(b"once") == 1

    def test_unterminated_tail_flushed_at_uninstall(self, tmp_path):
        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            os.write(2, b"E9 short held tail"[:10])  # held: possible prefix
            uninstall_native_log_filter()
        assert b"E9 short h" in sink.read_bytes()

    def test_genuine_cross_machine_mismatch_passes_through(self, tmp_path):
        """A REAL machine-feature mismatch (names an actual ISA feature) is
        the one diagnostic preceding a SIGILL — it must NOT be dropped."""
        real = (
            b"E0818 01:52:07.357736 8967 cpu_aot_loader.cc:210] Loading "
            b"XLA:CPU AOT result. Target machine feature +avx512f is not "
            b"supported on the host machine.\n"
        )
        sink = tmp_path / "stderr.txt"
        with fd2_to(sink):
            install_native_log_filter()
            os.write(2, real)
            os.write(2, SPAM)
            uninstall_native_log_filter()
        out = sink.read_bytes()
        assert b"+avx512f" in out
        assert b"+prefer-no-" not in out

    def test_stderr_isatty_survives_filter(self, tmp_path):
        with fd2_to(tmp_path / "stderr.txt"):
            install_native_log_filter()
            # fd 2 is now a pipe; the recorded answer must reflect the
            # stream the filter forwards to (the tempfile: not a tty)
            assert stderr_isatty() is False
            uninstall_native_log_filter()


class TestPrefixHeuristic:
    def test_glog_prefixes_held(self):
        assert _might_be_spam_prefix(b"E0818 01:52:07")
        assert _might_be_spam_prefix(SPAM[:80])
        assert _might_be_spam_prefix(b"E")  # 1-byte tail: no orphan bytes

    def test_ordinary_partials_forwarded(self):
        assert not _might_be_spam_prefix(b"\r\x1b[2Kindexing: 5/10")
        assert not _might_be_spam_prefix(b"error: real problem")
        assert not _might_be_spam_prefix(b"Exception in thread")  # E + non-digit
        assert not _might_be_spam_prefix(b"")

    def test_patterns_nonempty(self):
        assert NATIVE_SPAM_PATTERNS
