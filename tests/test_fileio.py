"""File layer tests: language detection, binary heuristics, ignore rules, walker."""

from pathlib import Path

from codesearch_tpu.fileio import (
    FileWalker,
    Language,
    detect_language,
    is_binary_content,
)
from codesearch_tpu.fileio.ignore import IgnoreFile


class TestLanguageDetection:
    def test_by_extension(self):
        assert detect_language("a/b/main.rs") is Language.RUST
        assert detect_language("x.py") is Language.PYTHON
        assert detect_language("x.pyi") is Language.PYTHON
        assert detect_language("x.tsx") is Language.TYPESCRIPT
        assert detect_language("x.jsx") is Language.TYPESCRIPT
        assert detect_language("x.cc") is Language.CPP
        assert detect_language("x.h") is Language.C
        assert detect_language("x.kts") is Language.KOTLIN
        assert detect_language("x.scss") is Language.CSS
        assert detect_language("x.csproj") is Language.XML
        assert detect_language("notes.txt") is Language.MARKDOWN

    def test_case_insensitive_extension(self):
        assert detect_language("MAIN.RS") is Language.RUST

    def test_extensionless_filenames(self):
        assert detect_language("Dockerfile") is Language.SHELL
        assert detect_language("Makefile") is Language.SHELL
        assert detect_language("Jenkinsfile") is Language.RUBY
        assert detect_language(".envrc") is Language.SHELL

    def test_unknown(self):
        assert detect_language("data.xyz123") is Language.UNKNOWN
        assert not Language.UNKNOWN.is_indexable()

    def test_structural_support(self):
        assert Language.RUST.supports_structural_chunking()
        assert Language.PYTHON.supports_structural_chunking()
        assert not Language.MARKDOWN.supports_structural_chunking()


class TestBinaryDetection:
    def test_null_bytes(self):
        assert is_binary_content(b"hello\x00world")

    def test_plain_text(self):
        assert not is_binary_content(b"fn main() {}\n")

    def test_empty(self):
        assert not is_binary_content(b"")

    def test_utf8_moderate_unicode_ok(self):
        # valid UTF-8 in the 30-80% non-printable band is NOT binary
        text = ("日本語 some ascii padding here ok\n" * 10).encode("utf-8")
        assert not is_binary_content(text)

    def test_utf8_extreme_unicode_flagged(self):
        # >80% non-printable is treated as binary even when valid UTF-8
        text = ("日本語テキスト\n" * 40).encode("utf-8")
        assert is_binary_content(text)

    def test_invalid_utf8_high_ratio(self):
        data = bytes([0xFF, 0xFE, 0xFD] * 100 + [0x41] * 10)
        assert is_binary_content(data)


class TestIgnoreRules:
    def test_simple_and_negation(self):
        f = IgnoreFile.parse("*.log\n!keep.log\n# comment\n\n")
        assert f.match("debug.log", is_dir=False) is True
        assert f.match("keep.log", is_dir=False) is False
        assert f.match("main.py", is_dir=False) is None

    def test_dir_only(self):
        f = IgnoreFile.parse("build/\n")
        assert f.match("build", is_dir=True) is True
        assert f.match("build", is_dir=False) is None

    def test_anchored(self):
        f = IgnoreFile.parse("/top.txt\nsrc/gen.rs\n")
        assert f.match("top.txt", is_dir=False) is True
        assert f.match("nested/top.txt", is_dir=False) is None
        assert f.match("src/gen.rs", is_dir=False) is True

    def test_double_star(self):
        f = IgnoreFile.parse("**/gen/*.out\n")
        assert f.match("a/b/gen/x.out", is_dir=False) is True
        assert f.match("gen/x.out", is_dir=False) is True
        assert f.match("gen/sub/x.out", is_dir=False) is None


class TestWalker:
    def test_walk_respects_filters(self, tmp_repo: Path):
        files, stats = FileWalker(tmp_repo).walk()
        names = {f.path.name for f in files}
        assert "main.py" in names
        assert "lib.rs" in names
        assert "README.md" in names
        assert "skipme.py" not in names  # gitignored dir
        assert "debug.log" not in names  # gitignored ext
        assert "image.png" not in names  # binary
        assert stats.indexed == len(files)
        assert stats.by_language.get("Python") == 1
        assert stats.by_language.get("Rust") == 1

    def test_walk_is_deterministic(self, tmp_repo: Path):
        a, _ = FileWalker(tmp_repo).walk()
        b, _ = FileWalker(tmp_repo).walk()
        assert [f.path for f in a] == [f.path for f in b]

    def test_egg_info_pruned(self, tmp_repo: Path):
        (tmp_repo / "pkg.egg-info").mkdir()
        (tmp_repo / "pkg.egg-info" / "SOURCES.txt").write_text("a\n")
        files, _ = FileWalker(tmp_repo).walk()
        assert all(".egg-info" not in str(f.path) for f in files)

    def test_excluded_dirs_pruned(self, tmp_repo: Path):
        (tmp_repo / "node_modules").mkdir()
        (tmp_repo / "node_modules" / "pkg.js").write_text("module.exports = 1;\n")
        files, _ = FileWalker(tmp_repo).walk()
        assert all("node_modules" not in str(f.path) for f in files)
