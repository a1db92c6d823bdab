"""WordPiece tokenizer tests with a synthetic local vocab (the BERT path
works without downloads when assets are provided)."""

from pathlib import Path

import pytest

from codesearch_tpu.models.tokenizer import WordPieceTokenizer, load_tokenizer


VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "parse", "config", "##ur", "##ation", "the", "file", "read",
    "##s", "def", "(", ")", ":",
]


@pytest.fixture()
def vocab_file(tmp_path: Path) -> Path:
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return p


class TestWordPiece:
    def test_greedy_longest_match(self, vocab_file):
        tk = WordPieceTokenizer(vocab_file)
        enc = tk.encode("parse the configuration file")
        toks = [VOCAB[i] for i in enc.ids]
        assert toks[0] == "[CLS]" and toks[-1] == "[SEP]"
        assert "parse" in toks
        # configuration → config ##ur ##ation
        assert "config" in toks and "##ur" in toks and "##ation" in toks

    def test_unknown_token(self, vocab_file):
        tk = WordPieceTokenizer(vocab_file)
        enc = tk.encode("zzzqqq")
        assert VOCAB[enc.ids[1]] == "[UNK]"

    def test_lowercase_and_accents(self, vocab_file):
        tk = WordPieceTokenizer(vocab_file, lowercase=True)
        a = tk.encode("PARSE Café file")
        b = tk.encode("parse cafe file")
        # accents stripped + lowercased → same prefix tokens for 'parse'
        assert a.ids[1] == b.ids[1]

    def test_truncation(self, vocab_file):
        tk = WordPieceTokenizer(vocab_file, max_len=6)
        enc = tk.encode("parse the file " * 50)
        assert len(enc.ids) <= 6
        assert enc.ids[-1] == tk.sep

    def test_load_tokenizer_prefers_vocab(self, tmp_path, vocab_file):
        import shutil

        model_dir = tmp_path / "model"
        model_dir.mkdir()
        shutil.copy(vocab_file, model_dir / "vocab.txt")
        tk = load_tokenizer(model_dir, lowercase=True, max_len=128)
        assert isinstance(tk, WordPieceTokenizer)

    def test_load_tokenizer_falls_back_to_hashing(self, tmp_path):
        from codesearch_tpu.models.tokenizer import HashingTokenizer

        tk = load_tokenizer(tmp_path / "missing", lowercase=True, max_len=128)
        assert isinstance(tk, HashingTokenizer)
