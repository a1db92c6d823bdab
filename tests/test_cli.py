"""CLI-level smoke tests: drive codesearch_tpu.cli.main() end-to-end."""

import json
from pathlib import Path

import pytest

from codesearch_tpu.cli.main import main


@pytest.fixture()
def cli_repo(tmp_repo, monkeypatch):
    monkeypatch.chdir(tmp_repo)
    return tmp_repo


class TestCliFlow:
    def test_index_search_stats_doctor(self, cli_repo, capsys):
        assert main(["--quiet", "index", "."]) == 0
        assert (cli_repo / ".codesearch.db" / "metadata.json").exists()
        # .codesearch.db auto-added to .gitignore? (no .git dir here — skip)

        assert main(["search", "parse_config", ".", "--compact"]) == 0
        out = capsys.readouterr().out
        assert "main.py" in out

        assert main(["stats", ".", "--json"]) == 0
        stats = json.loads(capsys.readouterr().out)
        assert stats["model"] == "code-hash-384"
        assert stats["vector"]["chunks"] > 0
        # serving-state observability (VERDICT r4 #8)
        assert stats["fts"]["planes_enabled"] is True
        for field in ("plane_rows_used", "plane_rows_cap", "plane_builds",
                      "plane_evictions", "plane_prewarms",
                      "exact_tier_sidecars", "exact_tier_hits"):
            assert field in stats["fts"], field

        assert main(["doctor", ".", "--json"]) == 0
        checks = json.loads(capsys.readouterr().out)
        assert all(c["ok"] for c in checks), checks
        names = [c["name"] for c in checks]
        assert "serving_state" in names

    def test_doctor_device_probe(self, cli_repo, capsys):
        """`doctor --device` appends the bounded round-trip check (on the
        CPU test backend the probe subprocess still exercises the real
        path: spawn, matmul, readback, value check)."""
        main(["--quiet", "index", "."])
        capsys.readouterr()
        rc = main(["--platform", "cpu", "doctor", ".", "--json", "--device"])
        checks = json.loads(capsys.readouterr().out)
        names = [c["name"] for c in checks]
        assert "device_roundtrip" in names
        dev = next(c for c in checks if c["name"] == "device_roundtrip")
        assert dev["ok"], dev
        assert rc == 0
        # default doctor must NOT pay the probe
        capsys.readouterr()
        assert main(["doctor", ".", "--json"]) == 0
        checks = json.loads(capsys.readouterr().out)
        assert "device_roundtrip" not in [c["name"] for c in checks]

    def test_doctor_device_probe_timeout(self, monkeypatch, cli_repo, capsys):
        """A wedged transfer must surface as a failed check with the
        explanation, not a hang (observed r5: d2h-only tunnel outage)."""
        import subprocess as sp

        from codesearch_tpu.cli import doctor as doc

        def hang(*a, **k):
            raise sp.TimeoutExpired("probe", k.get("timeout", 0))

        monkeypatch.setattr(sp, "run", hang)
        res = doc.check_device_roundtrip(timeout_s=1.0)
        assert res.name == "device_roundtrip" and not res.ok
        assert "readback" in res.detail or "down" in res.detail

    def test_search_json_output(self, cli_repo, capsys):
        main(["--quiet", "index", "."])
        capsys.readouterr()
        assert main(["search", "content hash", ".", "--json", "--scores"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["results"]
        assert "timings_ms" in payload
        assert payload["results"][0]["start_line"] >= 1  # 1-based for display

    def test_search_files_only(self, cli_repo, capsys):
        main(["--quiet", "index", "."])
        capsys.readouterr()
        assert main(["search", "parse_config", ".", "--files-only"]) == 0
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        assert lines and len(lines) == len(set(lines))   # unique paths only
        assert all(":" not in ln for ln in lines)        # bare paths

    def test_search_full_content(self, cli_repo, capsys):
        """--full prints the whole chunk body (reference cli/mod.rs:97-99);
        the default pretty output truncates to a 3-line snippet."""
        main(["--quiet", "index", "."])
        capsys.readouterr()
        assert main(["search", "parse_config", "."]) == 0
        default_out = capsys.readouterr().out
        assert main(["search", "parse_config", ".", "--full"]) == 0
        full_out = capsys.readouterr().out
        # the snippet view elides lines; the full view does not
        assert "more lines)" in default_out
        assert "more lines)" not in full_out
        assert len(full_out) > len(default_out)

    def test_index_dry_run(self, cli_repo, capsys):
        assert main(["index", ".", "--dry-run"]) == 0
        out = capsys.readouterr()
        assert "would index" in out.err or "dry run" in out.err
        assert not (cli_repo / ".codesearch.db").exists()

    def test_search_no_index_errors(self, tmp_path, monkeypatch, capsys):
        # search auto-creates by default (ref parity); --no-create-index
        # restores the hard error
        monkeypatch.chdir(tmp_path)
        assert main(["search", "anything", ".", "--no-create-index"]) == 1
        assert "error" in capsys.readouterr().err

    def test_setup_list(self, capsys):
        assert main(["setup", "--list"]) == 0
        out = capsys.readouterr().out
        assert "bge-small" in out and "code-hash-384" in out

    def test_clear_requires_confirmation(self, cli_repo, capsys):
        main(["--quiet", "index", "."])
        capsys.readouterr()
        assert main(["clear", "."]) == 1
        assert (cli_repo / ".codesearch.db").exists()
        assert main(["--quiet", "clear", ".", "--yes"]) == 0
        assert not (cli_repo / ".codesearch.db").exists()

    def test_cache_stats(self, capsys):
        assert main(["cache", "stats"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert "total_bytes" in payload

    def test_unknown_model_errors(self, cli_repo, capsys):
        assert main(["--model", "bogus", "search", "x", "."]) == 1
        assert "unknown model" in capsys.readouterr().err

    def test_train_and_search(self, cli_repo, capsys):
        assert main(["--quiet", "index", "."]) == 0
        rc = main(["--quiet", "train", ".", "--epochs", "3"])
        # tiny fixture may mine <16 pairs → clean error; otherwise success
        if rc == 0:
            assert (cli_repo / ".codesearch.db" / "hash_table.npz").exists()
            capsys.readouterr()
            assert main(["search", "parse_config", ".", "--compact"]) == 0
            assert "main.py" in capsys.readouterr().out
        else:
            assert "pairs" in capsys.readouterr().err

    def test_int8_index_and_search(self, cli_repo, capsys):
        assert main(["--quiet", "index", ".", "--int8"]) == 0
        meta = json.loads((cli_repo / ".codesearch.db" / "metadata.json").read_text())
        assert meta["int8"] is True
        capsys.readouterr()
        assert main(["search", "parse_config", ".", "--compact"]) == 0
        assert "main.py" in capsys.readouterr().out
