"""Logger rotation/retention tests with synthetic dated files — the pattern
the reference uses (logger/mod.rs:360-470 per SURVEY §4)."""

import datetime as dt

import pytest

from codesearch_tpu.utils.logger import (
    _DailyFileHandler,
    cleanup_old_logs,
    log_retention_settings,
)
from codesearch_tpu.utils.constants import LOG_FILE_NAME


def _mk(log_dir, date_str, content="x"):
    log_dir.mkdir(parents=True, exist_ok=True)
    p = log_dir / f"{LOG_FILE_NAME}.{date_str}"
    p.write_text(content)
    return p


class TestCleanup:
    def test_age_retention(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CODESEARCH_LOG_RETENTION_DAYS", "5")
        monkeypatch.setenv("CODESEARCH_LOG_MAX_FILES", "100")
        today = dt.date(2026, 3, 15)
        keep = [_mk(tmp_path, "2026-03-15"), _mk(tmp_path, "2026-03-10")]
        drop = [_mk(tmp_path, "2026-03-09"), _mk(tmp_path, "2026-01-01")]
        removed = cleanup_old_logs(tmp_path, today=today)
        assert removed == 2
        assert all(p.exists() for p in keep)
        assert not any(p.exists() for p in drop)

    def test_count_retention_keeps_newest(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CODESEARCH_LOG_RETENTION_DAYS", "365")
        monkeypatch.setenv("CODESEARCH_LOG_MAX_FILES", "3")
        today = dt.date(2026, 3, 15)
        paths = [_mk(tmp_path, f"2026-03-{d:02d}") for d in range(1, 9)]
        removed = cleanup_old_logs(tmp_path, today=today)
        assert removed == 5
        survivors = sorted(p.name for p in tmp_path.iterdir())
        assert survivors == [f"{LOG_FILE_NAME}.2026-03-0{d}" for d in (6, 7, 8)]
        assert paths[0].exists() is False

    def test_non_log_and_malformed_files_untouched(self, tmp_path, monkeypatch):
        monkeypatch.setenv("CODESEARCH_LOG_RETENTION_DAYS", "0")
        monkeypatch.setenv("CODESEARCH_LOG_MAX_FILES", "0")
        other = tmp_path / "notes.txt"
        tmp_path.mkdir(exist_ok=True)
        other.write_text("keep me")
        weird = tmp_path / f"{LOG_FILE_NAME}.not-a-date"
        weird.write_text("also keep")
        _mk(tmp_path, "2020-01-01")
        removed = cleanup_old_logs(tmp_path, today=dt.date(2026, 1, 1))
        assert removed == 1
        assert other.exists() and weird.exists()

    def test_missing_dir_is_noop(self, tmp_path):
        assert cleanup_old_logs(tmp_path / "nope") == 0

    def test_retention_settings_env(self, monkeypatch):
        monkeypatch.setenv("CODESEARCH_LOG_MAX_FILES", "7")
        monkeypatch.setenv("CODESEARCH_LOG_RETENTION_DAYS", "9")
        assert log_retention_settings() == (7, 9)


class TestDailyHandler:
    def test_writes_dated_file_and_switches(self, tmp_path, monkeypatch):
        import logging

        h = _DailyFileHandler(tmp_path)
        h.setFormatter(logging.Formatter("%(message)s"))
        rec = logging.LogRecord("t", logging.INFO, __file__, 1, "hello", (), None)
        h.emit(rec)
        today = dt.date.today().isoformat()
        p = tmp_path / f"{LOG_FILE_NAME}.{today}"
        assert p.exists() and "hello" in p.read_text()
        # midnight switch: fake a stale current date → new file opens
        h._current_date = "1999-01-01"
        h.emit(rec)
        assert p.read_text().count("hello") == 2
        h.close()
