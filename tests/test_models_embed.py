"""Model + embedding service tests: registry parity, tokenizers, encoder
shapes/determinism, hash embedder retrieval quality, caches."""

import numpy as np
import pytest

from codesearch_tpu.chunker import Chunk, ChunkKind
from codesearch_tpu.embed import EmbeddingService, clean_docstring, prepare_text
from codesearch_tpu.embed.cache import LruBytesCache, PersistentEmbeddingCache
from codesearch_tpu.models import parse_model, all_models
from codesearch_tpu.models.hash_embedder import HashEmbedder
from codesearch_tpu.models.tokenizer import HashingTokenizer, code_tokens, split_identifier


class TestRegistry:
    def test_reference_models_present(self):
        # all 16 reference models by short name (embedder.rs:132-151)
        for name in [
            "minilm-l6", "minilm-l6-q", "minilm-l12", "minilm-l12-q",
            "paraphrase-minilm", "bge-small", "bge-small-q", "bge-base",
            "bge-large", "nomic-v1", "nomic-v1.5", "nomic-v1.5-q",
            "jina-code", "e5-multilingual", "mxbai-large", "modernbert-large",
        ]:
            spec = parse_model(name)
            assert spec is not None, name

    def test_dims_parity(self):
        assert parse_model("bge-small").dims == 384
        assert parse_model("jina-code").dims == 768
        assert parse_model("bge-large").dims == 1024
        assert parse_model("modernbert-large").dims == 1024

    def test_aliases(self):
        assert parse_model("BGESmallENV15").short_name == "bge-small"
        assert parse_model("allminiml6v2q").short_name == "minilm-l6-q"

    def test_unknown(self):
        assert parse_model("not-a-model") is None

    def test_hash_models(self):
        assert parse_model("code-hash-384").kind == "hash"
        assert parse_model("code-hash-768").dims == 768


class TestTokenizer:
    def test_split_identifier(self):
        assert split_identifier("parse_config") == ["parse", "config"]
        assert split_identifier("getUserName") == ["get", "user", "name"]
        assert split_identifier("HTTPServer") == ["http", "server"]

    def test_code_tokens_include_whole_identifier(self):
        toks = code_tokens("fn parse_config(path)")
        assert "parse" in toks and "config" in toks and "parse_config" in toks

    def test_hashing_tokenizer_deterministic(self):
        tk = HashingTokenizer()
        a = tk.encode("def parse(x): return x")
        b = tk.encode("def parse(x): return x")
        assert a.ids == b.ids
        assert a.ids[0] == 101 and a.ids[-1] == 102  # CLS/SEP


class TestEncoder:
    def test_forward_shapes_and_norm(self):
        import jax
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import encode, init_params
        from codesearch_tpu.models.registry import ArchConfig

        cfg = ArchConfig(vocab_size=1000, hidden=64, layers=2, heads=4,
                         intermediate=128, max_len=64)
        params = init_params(jax.random.PRNGKey(0), cfg)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 1000, (3, 16)))
        mask = jnp.ones((3, 16), jnp.int32)
        out = encode(params, ids, mask, cfg)
        assert out.shape == (3, 64)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1), 1.0, atol=1e-5)

    def test_padding_invariance_mean_pool(self):
        import jax
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import encode, init_params
        from codesearch_tpu.models.registry import ArchConfig

        cfg = ArchConfig(vocab_size=1000, hidden=64, layers=2, heads=4,
                         intermediate=128, max_len=64)
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        ids = rng.integers(1, 1000, (1, 8))
        short = encode(params, jnp.asarray(ids), jnp.ones((1, 8), jnp.int32), cfg)
        padded_ids = np.concatenate([ids, np.zeros((1, 8), np.int64)], axis=1)
        mask = np.concatenate([np.ones((1, 8)), np.zeros((1, 8))], axis=1)
        long = encode(params, jnp.asarray(padded_ids), jnp.asarray(mask, jnp.int32), cfg)
        np.testing.assert_allclose(np.asarray(short), np.asarray(long), atol=2e-2)


class TestHashEmbedder:
    def test_deterministic(self):
        e = HashEmbedder(384)
        a = e.embed_texts(["fn parse_config(path: &str)"])
        b = e.embed_texts(["fn parse_config(path: &str)"])
        np.testing.assert_array_equal(a, b)

    def test_semantic_ordering(self):
        """Related code should score higher than unrelated code."""
        e = HashEmbedder(384)
        docs = e.embed_texts([
            "fn parse_config(path: &str) -> Config { read configuration file }",
            "fn draw_triangle(canvas: &mut Canvas) { render graphics }",
        ])
        q = e.embed_texts(["how is the configuration file parsed"])[0]
        sims = docs @ q
        assert sims[0] > sims[1]

    def test_identifier_exact_match_signal(self):
        e = HashEmbedder(384)
        docs = e.embed_texts([
            "fn handle_file_modified(event: Event)",
            "fn handle_directory_created(event: Event)",
        ])
        q = e.embed_texts(["handle_file_modified"])[0]
        sims = docs @ q
        assert sims[0] > sims[1]

    def test_normalized(self):
        e = HashEmbedder(384)
        v = e.embed_texts(["some code here"])
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)

    def test_bit_rounding_matches_ml_dtypes(self):
        """The host table's bit-level bf16 rounding must equal ml_dtypes'
        round-to-nearest-even exactly (the device stores bf16; the host
        read plane must score with identical values)."""
        import ml_dtypes

        from codesearch_tpu.models.hash_embedder import _round_bf16_f32

        rng = np.random.default_rng(7)
        x = np.concatenate([
            rng.standard_normal(4096).astype(np.float32),
            np.array([0.0, -0.0, 1.0, -1.0, 1e-38, -1e38, 3.14159], np.float32),
        ])
        expect = x.astype(ml_dtypes.bfloat16).astype(np.float32)
        np.testing.assert_array_equal(_round_bf16_f32(x), expect)

    def test_host_table_matches_device_table(self):
        """table_np() values == a device gather of the bf16 table."""
        import jax.numpy as jnp

        e = HashEmbedder(64)
        dev = np.asarray(jnp.asarray(e.table, jnp.float32))
        np.testing.assert_array_equal(e.table_np(), dev)

    def test_table_bits_cache_roundtrip(self, tmp_path, monkeypatch):
        """On the CPU backend make_table writes the bf16 bits cache; later
        loads (device table AND host twin) are byte-identical to the
        generated values, and a corrupt cache falls back to regeneration."""
        import jax.numpy as jnp

        from codesearch_tpu.models.hash_embedder import make_table

        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path))
        first = np.asarray(jnp.asarray(make_table(32, buckets=1024),
                                       jnp.float32))
        cached = list(tmp_path.glob("hash_table_*_1024x32.*.u16"))
        assert len(cached) == 1
        second = np.asarray(jnp.asarray(make_table(32, buckets=1024),
                                        jnp.float32))
        np.testing.assert_array_equal(first, second)
        # corrupt cache (wrong size) falls back to regeneration
        cached[0].write_bytes(b"\x00\x01\x02")
        third = np.asarray(jnp.asarray(make_table(32, buckets=1024),
                                       jnp.float32))
        np.testing.assert_array_equal(first, third)

    def test_table_np_lazy_fetch_writes_bits_cache(self, tmp_path, monkeypatch):
        """Default-shape embedders resolve table_np from the device table
        when no bits cache exists, then persist it for later processes."""
        import codesearch_tpu.models.hash_embedder as he

        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path))
        e = he.HashEmbedder(16)   # default bucket count, tiny dims
        # simulate a cold cache (make_table on CPU writes it eagerly)
        for f in tmp_path.glob("hash_table_*.u16"):
            f.unlink()
        e._host_table = None
        host = e.table_np()
        import jax.numpy as jnp

        dev = np.asarray(jnp.asarray(e.table, jnp.float32))
        np.testing.assert_array_equal(host, dev)
        assert list(tmp_path.glob("hash_table_*x16.*.u16"))
        # a second embedder now loads the twin straight from the bits
        e2 = he.HashEmbedder(16)
        np.testing.assert_array_equal(e2.table_np(), dev)


class TestPrepareText:
    def test_prepare_text_sections(self):
        c = Chunk(
            content="fn add(a: i32, b: i32) -> i32 { a + b }",
            start_line=0, end_line=1, kind=ChunkKind.FUNCTION, path="m.rs",
            context=["File: m.rs", "Function: add"],
            signature="fn add(a: i32, b: i32) -> i32",
            docstring="/// Adds two numbers",
        )
        text = prepare_text(c)
        assert "Context: File: m.rs > Function: add" in text
        assert "Signature: fn add" in text
        assert "Name: add" in text
        assert "Documentation: Adds two numbers" in text
        assert text.endswith("Code:\nfn add(a: i32, b: i32) -> i32 { a + b }")

    def test_clean_docstring(self):
        assert clean_docstring("/// Hello\n/// World") == "Hello World"
        assert clean_docstring("/** JSDoc\n * line\n */") == "JSDoc line"


class TestCaches:
    def test_lru_eviction_by_bytes(self):
        c = LruBytesCache(max_bytes=100 * 4)  # 100 f32s
        for i in range(20):
            c.put(str(i), np.ones(10, np.float32))  # 40 bytes each
        assert c.size_bytes <= 400
        assert c.get("19") is not None
        assert c.get("0") is None

    def test_persistent_roundtrip(self, tmp_path):
        p = PersistentEmbeddingCache(tmp_path, dims=8)
        vecs = {f"h{i}": np.full(8, i, np.float32) for i in range(5)}
        p.put_batch(vecs)
        got = p.get_batch(["h1", "h3", "nope"])
        assert set(got) == {"h1", "h3"}
        np.testing.assert_array_equal(got["h3"], np.full(8, 3, np.float32))
        # reopen persists
        p2 = PersistentEmbeddingCache(tmp_path, dims=8)
        assert len(p2) == 5
        got2 = p2.get_batch(["h4"])
        np.testing.assert_array_equal(got2["h4"], np.full(8, 4, np.float32))

    def test_persistent_dims_change_invalidates(self, tmp_path):
        p = PersistentEmbeddingCache(tmp_path, dims=8)
        p.put_batch({"h": np.zeros(8, np.float32)})
        p2 = PersistentEmbeddingCache(tmp_path, dims=16)
        assert len(p2) == 0

    def test_persistent_eviction(self, tmp_path):
        p = PersistentEmbeddingCache(tmp_path, dims=4, max_entries=10)
        p.put_batch({f"h{i}": np.full(4, i, np.float32) for i in range(25)})
        assert len(p) == 10
        got = p.get_batch([f"h{i}" for i in range(25)])
        assert set(got) == {f"h{i}" for i in range(15, 25)}
        np.testing.assert_array_equal(got["h20"], np.full(4, 20, np.float32))


class TestEmbeddingService:
    def _chunks(self, texts):
        return [
            Chunk(content=t, start_line=0, end_line=1, kind=ChunkKind.FUNCTION, path="x")
            for t in texts
        ]

    def test_embed_chunks_order_preserved(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        chunks = self._chunks(["alpha beta", "gamma delta", "alpha beta"])
        out = svc.embed_chunks(chunks)
        assert len(out) == 3
        np.testing.assert_array_equal(out[0].embedding, out[2].embedding)
        assert not np.allclose(out[0].embedding, out[1].embedding)

    def test_cache_hit_on_second_call(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        chunks = self._chunks(["one", "two"])
        svc.embed_chunks(chunks)
        svc2 = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        svc2.embed_chunks(self._chunks(["one", "two"]))
        assert svc2.persistent.hits == 2

    def test_query_cache(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        a = svc.embed_query("find the parser")
        b = svc.embed_query("find the parser")
        np.testing.assert_array_equal(a, b)
        assert svc.query_cache.hits >= 1

    def test_batch_queries(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        out = svc.embed_queries_batch(["q1", "q2", "q1"])
        assert len(out) == 3
        np.testing.assert_array_equal(out[0], out[2])

    def test_bert_random_init_works(self, tmp_path):
        # tiny BERT via random init (no weights in this environment)
        svc = EmbeddingService("minilm-l6", cache_dir=tmp_path)
        out = svc.embed_chunks(self._chunks(["def f(): pass"]))
        assert out[0].embedding.shape == (384,)
        np.testing.assert_allclose(np.linalg.norm(out[0].embedding), 1.0, atol=1e-4)


class TestEmbedAsync:
    """embed_chunks_matrix_async contract: dispatch now, finalize later;
    cache puts happen at finalize (the index pipeline overlaps one
    in-flight slab's device compute with the previous slab's host work)."""

    def _chunks(self, texts):
        return [
            Chunk(content=t, start_line=0, end_line=1, kind=ChunkKind.FUNCTION, path="x")
            for t in texts
        ]

    def test_async_matches_sync_hash(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        chunks = self._chunks(["alpha beta", "gamma delta", "alpha beta"])
        sync = svc.embed_chunks_matrix(chunks)
        svc2 = EmbeddingService("code-hash-384", cache_dir=tmp_path / "b")
        finish = svc2.embed_chunks_matrix_async(chunks)
        np.testing.assert_array_equal(sync, finish())

    def test_async_matches_sync_bert(self, tmp_path):
        texts = ["short", "x " * 40, "mid words here", "y " * 120]
        svc = EmbeddingService("minilm-l6", cache_dir=tmp_path,
                               use_persistent_cache=False)
        # spread lengths across two buckets to cover multi-bucket assembly
        sync = svc.embed_chunks_matrix(self._chunks(texts))
        # fresh service: the async leg must go through the backend's
        # bucket dispatch, not the mem cache
        svc2 = EmbeddingService("minilm-l6", cache_dir=tmp_path / "b",
                                use_persistent_cache=False)
        finish = svc2.embed_chunks_matrix_async(self._chunks(texts))
        np.testing.assert_allclose(sync, finish(), rtol=1e-5, atol=1e-6)

    def test_cache_puts_deferred_to_finalize(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        chunks = self._chunks(["deferred cache row"])
        h = chunks[0].hash
        finish = svc.embed_chunks_matrix_async(chunks)
        assert svc.mem_cache.get(h) is None, "put must wait for finalize"
        out = finish()
        np.testing.assert_array_equal(svc.mem_cache.get(h), out[0])

    def test_empty_slab(self, tmp_path):
        svc = EmbeddingService("code-hash-384", cache_dir=tmp_path)
        assert svc.embed_chunks_matrix_async([])().shape == (0, 384)
