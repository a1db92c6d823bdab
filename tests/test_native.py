"""Native tier parity tests: C++ output must be byte-identical to Python.

Property-tested over real source corpora (this repo + the reference's Rust)
and adversarial strings.
"""

import numpy as np
import pytest

from codesearch_tpu import native
from codesearch_tpu.chunker.lexer import mask_c_family, mask_python
from codesearch_tpu.models.hash_embedder import _featurize_py
from codesearch_tpu.models.tokenizer import code_tokens
from codesearch_tpu.utils.hashing import stable_u64

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native tier unavailable"
)


def _py_mask(family: str, src: str) -> str:
    if family == "python":
        return mask_python(src)
    if family == "rust":
        return mask_c_family(src, nested_block_comments=True,
                             raw_strings_rust=True, lifetimes=True)
    if family == "go":
        return mask_c_family(src, backtick_strings=True)
    if family in ("js", "ts"):
        return mask_c_family(src, template_literals=True)
    return mask_c_family(src)


MASK_CASES = [
    ("rust", 'fn f() { let s = "a { b }"; } // brace }\n'),
    ("rust", 'let s = r#"hello "x" { } "#; fn g() {}'),
    ("rust", "fn f<'a>(x: &'a str) { let c = 'x'; let d = '\\n'; }"),
    ("rust", "/* outer /* inner */ still */ fn f() {}"),
    ("rust", '"unterminated\nfn g() {}'),
    ("rust", "/* unterminated forever"),
    ("go", 'var s = `raw { string`\nfunc main() {}\n'),
    ("go", "var s = `unterminated\nfunc f() {}"),
    ("ts", "const s = `hi ${name} {`; function f() {}"),
    ("ts", "const s = `esc \\` tick`; let x = 1;"),
    ("c", 'char* s = "x{y"; /* c */ int f() { return 0; }'),
    ("python", 'def f():\n    """doc { brace"""\n    s = "str"  # comment\n'),
    ("python", "s = '''unterminated\ndef g(): pass"),
    ("python", "x = 'a' + \"b\" + '\\'' # quotes\n"),
]


class TestMaskParity:
    @pytest.mark.parametrize("family,src", MASK_CASES)
    def test_cases(self, family, src):
        got = native.mask_native(family, src)
        assert got is not None
        assert got == _py_mask(family, src)

    def test_real_corpora(self):
        from pathlib import Path

        files = list(Path("/root/repo/codesearch_tpu").rglob("*.py"))[:20]
        for f in files:
            src = f.read_text()
            if not src.isascii():
                continue
            assert native.mask_native("python", src) == _py_mask("python", src), f

    def test_real_rust_corpus(self):
        from pathlib import Path

        files = list(Path("/root/reference/src").rglob("*.rs"))[:20]
        for f in files:
            src = f.read_text(errors="replace")
            if not src.isascii():
                continue
            assert native.mask_native("rust", src) == _py_mask("rust", src), f


FEAT_CASES = [
    "fn parse_config(path: &str) -> Config",
    "class HTTPServer extends BaseServer { getUserName() {} }",
    "x" * 30 + " short togetherAgain snake_case_id a1b2C3",
    "",
    "   \n\t  ",
    "日本語 mixed unicode_ident ascii",
    "a b a b a b",  # repeated bigrams
    # UTF-8 whole-flag parity: >12 bytes but ≤12 chars must NOT get the
    # whole-identifier weight (len() counts code points, not bytes)
    "функция обработкаДанных",
    "очень_длинная_функция_обработки",   # >12 chars AND underscores
    "処理する非常に長い識別子名前です x",  # 13 chars, 39 bytes → whole flag
]


class TestFeaturizeParity:
    @pytest.mark.parametrize("text", FEAT_CASES)
    def test_cases(self, text):
        got = native.featurize_native(text)
        assert got is not None
        ids_n, ws_n = got
        ids_p, ws_p = _featurize_py(text)
        np.testing.assert_array_equal(ids_n, ids_p)
        np.testing.assert_array_equal(ws_n, ws_p)

    def test_real_corpus(self):
        from pathlib import Path

        for f in list(Path("/root/reference/src").rglob("*.rs"))[:10]:
            text = f.read_text(errors="replace")
            ids_n, ws_n = native.featurize_native(text)
            ids_p, ws_p = _featurize_py(text)
            np.testing.assert_array_equal(ids_n, ids_p, err_msg=str(f))
            np.testing.assert_array_equal(ws_n, ws_p, err_msg=str(f))


class TestFeaturizeBatchParity:
    def test_batch_matches_per_text(self):
        got = native.featurize_batch_native(list(FEAT_CASES))
        assert got is not None and len(got) == len(FEAT_CASES)
        for text, (ids_b, ws_b) in zip(FEAT_CASES, got):
            ids_1, ws_1 = native.featurize_native(text)
            np.testing.assert_array_equal(ids_b, ids_1, err_msg=repr(text))
            np.testing.assert_array_equal(ws_b, ws_1, err_msg=repr(text))

    def test_batch_features_padded_parity(self):
        """batch_features must be identical with and without the batched
        native path (the query/index planes both consume it)."""
        import codesearch_tpu.models.hash_embedder as he

        texts = list(FEAT_CASES) + ["def f(x): return x + 1"]
        ids_b, ws_b = he.batch_features(texts)
        pairs = [he.featurize(t) for t in texts]
        t_max = ids_b.shape[1]
        for row, (i, w) in enumerate(pairs):
            m = min(len(i), t_max)
            np.testing.assert_array_equal(ids_b[row, :m], i[:m])
            np.testing.assert_array_equal(ws_b[row, :m], w[:m])


class TestTokenHashParity:
    @pytest.mark.parametrize("text", FEAT_CASES)
    def test_cases(self, text):
        got = native.token_hashes_native(text)
        assert got is not None
        expect = np.asarray(
            [np.int64(np.uint64(stable_u64(t))) for t in code_tokens(text)],
            np.int64,
        ) if code_tokens(text) else np.zeros(0, np.int64)
        np.testing.assert_array_equal(got, expect)


class TestNativeSpeedup:
    def test_featurize_speedup(self):
        import time

        text = open("/root/reference/src/vectordb/store.rs").read()
        native.featurize_native(text)  # warm
        t0 = time.time()
        for _ in range(20):
            native.featurize_native(text)
        t_native = time.time() - t0
        t0 = time.time()
        for _ in range(20):
            _featurize_py(text)
        t_py = time.time() - t0
        assert t_native < t_py, f"native {t_native:.3f}s not faster than python {t_py:.3f}s"


class TestTokenHashesBatchParity:
    def test_batch_matches_per_text(self):
        texts = list(FEAT_CASES) + ["", "   ", "def parse_config(p): pass",
                                    "χ = σ**2  # unicode"]
        got = native.token_hashes_batch_native(texts)
        assert got is not None and len(got) == len(texts)
        for text, ids_b in zip(texts, got):
            ids_1 = native.token_hashes_native(text)
            np.testing.assert_array_equal(ids_b, ids_1, err_msg=repr(text))

    def test_term_keys_batch_matches_term_keys(self):
        from codesearch_tpu.fts.store import term_keys, term_keys_batch

        texts = ["def walk_tree(root):\n    return list(root)",
                 "", "pub fn walk_repo(r: &Path) -> Vec<FileInfo>"]
        got = term_keys_batch(texts)
        for t, keys in zip(texts, got):
            np.testing.assert_array_equal(keys, term_keys(t), err_msg=repr(t))

    def test_real_corpus(self):
        from pathlib import Path

        files = [f.read_text(errors="replace")
                 for f in list(Path("/root/reference/src").rglob("*.rs"))[:6]]
        got = native.token_hashes_batch_native(files)
        assert got is not None
        for text, ids_b in zip(files, got):
            np.testing.assert_array_equal(ids_b, native.token_hashes_native(text))


class TestScatterRuns:
    @pytest.mark.parametrize("dtype", [np.int32, np.int64])
    def test_matches_numpy_scatter(self, dtype):
        """cs_scatter_runs must be byte-identical to the numpy
        arange/repeat/fancy-index scatter it replaces in
        FtsStore._merge_segments, for both posting dtypes."""
        rng = np.random.default_rng(11)
        n_merged = 30
        # two parts with overlapping term positions and varied run lengths
        def mk_part():
            pos = np.sort(rng.choice(n_merged, size=18, replace=False))
            counts = rng.integers(1, 7, size=18)
            n = int(counts.sum())
            return (pos.astype(np.int64), counts.astype(np.int64),
                    rng.integers(0, 1 << 20, size=n).astype(dtype),
                    rng.integers(1, 99, size=n).astype(np.int16),
                    rng.integers(0, 9, size=n).astype(np.int16))

        parts = [mk_part(), mk_part()]
        total = np.zeros(n_merged, np.int64)
        for pos, counts, *_ in parts:
            total[pos] += counts
        offsets = np.zeros(n_merged + 1, np.int64)
        np.cumsum(total, out=offsets[1:])
        n_total = int(offsets[-1])

        def run(use_native: bool):
            out_d = np.full(n_total, -1, dtype)
            out_c = np.full(n_total, -1, np.int16)
            out_s = np.full(n_total, -1, np.int16)
            cursor = offsets[:-1].copy()
            for pos, counts, dnums, tfc, tfs in parts:
                if use_native:
                    assert native.scatter_runs_native(
                        pos, counts, cursor, dnums, tfc, tfs,
                        out_d, out_c, out_s)
                else:
                    run_starts = np.zeros(len(counts), np.int64)
                    np.cumsum(counts[:-1], out=run_starts[1:])
                    within = np.arange(len(dnums), dtype=np.int64) - \
                        np.repeat(run_starts, counts)
                    dest = np.repeat(cursor[pos], counts) + within
                    out_d[dest] = dnums
                    out_c[dest] = tfc
                    out_s[dest] = tfs
                    cursor[pos] += counts
            return out_d, out_c, out_s, cursor

        for a, b in zip(run(True), run(False)):
            np.testing.assert_array_equal(a, b)


class TestEmbedChunksMatrix:
    def test_matches_embed_chunks_with_cache_mix(self, tmp_path):
        """embed_chunks_matrix must equal the stacked embed_chunks rows
        across fresh, cached, and duplicate chunks."""
        from codesearch_tpu.chunker import Chunk, ChunkKind
        from codesearch_tpu.embed import EmbeddingService

        svc = EmbeddingService("code-hash-384", use_persistent_cache=False)

        def mk(i):
            return Chunk(content=f"def f_{i}(x):\n    return x + {i}\n",
                         start_line=0, end_line=1, kind=ChunkKind.FUNCTION,
                         path=f"m_{i}.py", signature=f"def f_{i}(x)")

        warm = [mk(0), mk(1)]
        svc.embed_chunks(warm)  # pre-populate the mem cache
        chunks = [mk(0), mk(2), mk(3), mk(2), mk(1)]  # cached + fresh + dup
        mat = svc.embed_chunks_matrix(chunks)
        ref = np.stack([e.embedding for e in svc.embed_chunks(chunks)])
        assert mat.shape == ref.shape == (5, svc.dims)
        np.testing.assert_array_equal(mat, ref)
