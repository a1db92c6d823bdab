"""HF safetensors loading path: exercised with synthetic checkpoints (no
downloads exist in this environment, so this is the only coverage for the
pretrained-weights code path)."""

import numpy as np
import pytest

from codesearch_tpu.models.registry import ArchConfig

CFG = ArchConfig(vocab_size=200, hidden=32, layers=2, heads=2,
                 intermediate=64, max_len=64, type_vocab_size=2)


def _synthetic_hf_bert(path, prefix=""):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    t = {}

    def add(name, shape):
        t[prefix + name] = rng.standard_normal(shape).astype(np.float32)

    add("embeddings.word_embeddings.weight", (CFG.vocab_size, CFG.hidden))
    add("embeddings.position_embeddings.weight", (CFG.max_len, CFG.hidden))
    add("embeddings.token_type_embeddings.weight", (2, CFG.hidden))
    add("embeddings.LayerNorm.weight", (CFG.hidden,))
    add("embeddings.LayerNorm.bias", (CFG.hidden,))
    for i in range(CFG.layers):
        L = f"encoder.layer.{i}."
        for qkv in ("query", "key", "value"):
            add(L + f"attention.self.{qkv}.weight", (CFG.hidden, CFG.hidden))
            add(L + f"attention.self.{qkv}.bias", (CFG.hidden,))
        add(L + "attention.output.dense.weight", (CFG.hidden, CFG.hidden))
        add(L + "attention.output.dense.bias", (CFG.hidden,))
        add(L + "attention.output.LayerNorm.weight", (CFG.hidden,))
        add(L + "attention.output.LayerNorm.bias", (CFG.hidden,))
        add(L + "intermediate.dense.weight", (CFG.intermediate, CFG.hidden))
        add(L + "intermediate.dense.bias", (CFG.intermediate,))
        add(L + "output.dense.weight", (CFG.hidden, CFG.intermediate))
        add(L + "output.dense.bias", (CFG.hidden,))
        add(L + "output.LayerNorm.weight", (CFG.hidden,))
        add(L + "output.LayerNorm.bias", (CFG.hidden,))
    save_file(t, str(path))
    return t


class TestSafetensorsLoad:
    def test_load_and_forward(self, tmp_path):
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import encode, load_safetensors

        st = tmp_path / "model.safetensors"
        raw = _synthetic_hf_bert(st)
        params = load_safetensors(st, CFG)
        # kernels transposed from HF [out, in] → [in, out]
        np.testing.assert_array_equal(
            np.asarray(params["layers"][0]["q_w"]),
            raw["encoder.layer.0.attention.self.query.weight"].T,
        )
        ids = jnp.asarray(np.arange(10)[None, :] % CFG.vocab_size)
        out = encode(params, ids, jnp.ones_like(ids), CFG)
        assert out.shape == (1, CFG.hidden)
        assert np.isfinite(np.asarray(out)).all()

    def test_load_with_bert_prefix(self, tmp_path):
        from codesearch_tpu.models.encoder import load_safetensors

        st = tmp_path / "model.safetensors"
        _synthetic_hf_bert(st, prefix="bert.")
        params = load_safetensors(st, CFG)
        assert len(params["layers"]) == CFG.layers

    def test_missing_tensor_raises(self, tmp_path):
        from safetensors.numpy import save_file

        from codesearch_tpu.models.encoder import load_safetensors

        st = tmp_path / "model.safetensors"
        save_file({"embeddings.word_embeddings.weight":
                   np.zeros((10, 4), np.float32)}, str(st))
        with pytest.raises(KeyError):
            load_safetensors(st, CFG)

    def test_service_uses_local_weights(self, tmp_path, monkeypatch):
        """EmbeddingService picks up model.safetensors from the models dir."""
        import codesearch_tpu.utils.constants as consts

        monkeypatch.setenv("CODESEARCH_HOME", str(tmp_path))
        model_dir = tmp_path / "models" / "minilm-l6"
        model_dir.mkdir(parents=True)
        # too-small arch for the real minilm config — we only check the
        # pretrained flag wiring, so build matching tensors for its config
        from codesearch_tpu.models.registry import MODELS

        cfg = MODELS["minilm-l6"].arch
        global CFG
        saved = CFG
        try:
            CFG = cfg
            _synthetic_hf_bert(model_dir / "model.safetensors")
        finally:
            CFG = saved
        from codesearch_tpu.embed.service import _BertBackend

        backend = _BertBackend(MODELS["minilm-l6"], tmp_path / "models")
        assert backend.pretrained is True


class TestCrossEncoderPairScoring:
    def test_model_path_with_synthetic_weights(self, tmp_path):
        from safetensors.numpy import save_file

        from codesearch_tpu.models import cross_encoder as ce

        # synthetic cross-encoder checkpoint matching a tiny arch
        tiny = ArchConfig(vocab_size=200, hidden=32, layers=1, heads=2,
                          intermediate=64, max_len=64, pooling="cls")
        orig = ce.CROSS_ENCODER_ARCH
        ce.CROSS_ENCODER_ARCH = tiny
        try:
            model_dir = tmp_path / "jina-reranker-v1-turbo-en"
            model_dir.mkdir()
            st = model_dir / "model.safetensors"
            global CFG
            saved = CFG
            CFG = tiny
            try:
                _synthetic_hf_bert(st)
            finally:
                CFG = saved
            # add pooler + classifier head
            rng = np.random.default_rng(1)
            from safetensors import safe_open

            with safe_open(str(st), framework="np") as f:
                tensors = {k: f.get_tensor(k) for k in f.keys()}
            tensors["bert.pooler.dense.weight"] = rng.standard_normal((32, 32)).astype(np.float32)
            tensors["bert.pooler.dense.bias"] = np.zeros(32, np.float32)
            tensors["classifier.weight"] = rng.standard_normal((1, 32)).astype(np.float32)
            tensors["classifier.bias"] = np.zeros(1, np.float32)
            save_file(tensors, str(st))

            model = ce.CrossEncoder(tmp_path)
            assert model.pretrained
            scores = model.score_pairs("find parser", ["def parse(): ...", "class Draw: ..."])
            assert scores.shape == (2,)
            assert ((scores > 0) & (scores < 1)).all()
        finally:
            ce.CROSS_ENCODER_ARCH = orig

    def test_proxy_path_without_weights(self, tmp_path):
        from codesearch_tpu.models.cross_encoder import CrossEncoder

        model = CrossEncoder(tmp_path / "nonexistent")
        assert not model.pretrained
        s = model.score_pairs("q", ["a", "b"])
        assert s.shape == (2,)


NOMIC_CFG = ArchConfig(vocab_size=128, hidden=32, layers=2, heads=4,
                       intermediate=64, max_len=64, arch_style="nomic",
                       rope_base=1000.0)
MB_CFG = ArchConfig(vocab_size=128, hidden=32, layers=4, heads=4,
                    intermediate=48, max_len=64, layer_norm_eps=1e-5,
                    arch_style="modernbert", rope_base=160000.0,
                    rope_base_local=10000.0, local_window=8, global_every=3)


def _synthetic_nomic(path, cfg=NOMIC_CFG):
    """nomic-ai/nomic-embed-text-v1 tensor names/shapes (embedder.rs:24-31)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(1)
    t = {}

    def add(name, shape):
        t[name] = (rng.standard_normal(shape) * 0.05).astype(np.float32)

    h, m = cfg.hidden, cfg.intermediate
    add("embeddings.word_embeddings.weight", (cfg.vocab_size, h))
    add("embeddings.token_type_embeddings.weight", (2, h))
    add("emb_ln.weight", (h,)); add("emb_ln.bias", (h,))
    for i in range(cfg.layers):
        L = f"encoder.layers.{i}."
        add(L + "attn.Wqkv.weight", (3 * h, h))
        add(L + "attn.out_proj.weight", (h, h))
        add(L + "norm1.weight", (h,)); add(L + "norm1.bias", (h,))
        add(L + "mlp.fc11.weight", (m, h))
        add(L + "mlp.fc12.weight", (m, h))
        add(L + "mlp.fc2.weight", (h, m))
        add(L + "norm2.weight", (h,)); add(L + "norm2.bias", (h,))
    save_file(t, str(path))
    return t


def _synthetic_modernbert(path, cfg=MB_CFG):
    """answerdotai/ModernBERT tensor names/shapes (layer 0 has no attn_norm)."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(2)
    t = {}

    def add(name, shape):
        t["model." + name] = (rng.standard_normal(shape) * 0.05).astype(np.float32)

    h, m = cfg.hidden, cfg.intermediate
    add("embeddings.tok_embeddings.weight", (cfg.vocab_size, h))
    add("embeddings.norm.weight", (h,))
    add("final_norm.weight", (h,))
    for i in range(cfg.layers):
        L = f"layers.{i}."
        add(L + "attn.Wqkv.weight", (3 * h, h))
        add(L + "attn.Wo.weight", (h, h))
        if i > 0:
            add(L + "attn_norm.weight", (h,))
        add(L + "mlp.Wi.weight", (2 * m, h))
        add(L + "mlp.Wo.weight", (h, m))
        add(L + "mlp_norm.weight", (h,))
    save_file(t, str(path))
    return t


class TestArchVariants:
    """VERDICT r1 item 5: Nomic (rotary/SwiGLU) and ModernBERT (pre-norm,
    GeGLU, alternating local/global attention) must load and run."""

    def _roundtrip(self, tmp_path, builder, cfg):
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import encode, load_safetensors

        st = tmp_path / "model.safetensors"
        builder(st, cfg)
        params = load_safetensors(st, cfg)
        ids = jnp.asarray(np.arange(24).reshape(2, 12) % cfg.vocab_size)
        mask = jnp.ones((2, 12), jnp.int32)
        out = np.asarray(encode(params, ids, mask, cfg))
        assert out.shape == (2, cfg.hidden)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
        return params, out

    def test_nomic_load_and_forward(self, tmp_path):
        params, _ = self._roundtrip(tmp_path, _synthetic_nomic, NOMIC_CFG)
        # no learned positions in the pytree — positions are rotary
        assert "position" not in params["embeddings"]

    def test_nomic_checkpoint_dropin_via_service(self, tmp_path):
        """VERDICT r3 item 10: dropping a real nomic model.safetensors into
        the models cache must be a no-code-change event — the service
        backend finds it, loads it, flags pretrained, and the fused read
        plane's featurize_queries/encode path runs on those weights."""
        import dataclasses

        from codesearch_tpu.embed.service import _BertBackend
        from codesearch_tpu.models.registry import MODELS

        spec = dataclasses.replace(MODELS["nomic-v1"], arch=NOMIC_CFG,
                                   dims=NOMIC_CFG.hidden)
        model_dir = tmp_path / "models" / spec.short_name
        model_dir.mkdir(parents=True)
        _synthetic_nomic(model_dir / "model.safetensors")
        backend = _BertBackend(spec, tmp_path / "models")
        assert backend.pretrained is True, "checkpoint not picked up"
        out = backend.embed(["search_query: where is the rotary cache"])
        assert out.shape == (1, NOMIC_CFG.hidden)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-4)
        # fused-dispatch featurization consumes the same params
        ids, mask = backend.featurize_queries(["search_query: rotary cache"])
        assert ids.shape == mask.shape and ids.shape[0] == 1
        from codesearch_tpu.models.encoder import encode

        v = np.asarray(encode(backend.params, ids, mask, backend.cfg))
        assert np.isfinite(v).all()

    def test_modernbert_load_and_forward(self, tmp_path):
        params, _ = self._roundtrip(tmp_path, _synthetic_modernbert, MB_CFG)
        assert "attn_ln_scale" not in params["layers"][0]
        assert "attn_ln_scale" in params["layers"][1]

    def test_rope_encodes_relative_position(self):
        """Rotary q·k scores must depend on relative distance only: equal
        for equal (i-j), different for different (i-j)."""
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import _apply_rope

        rng = np.random.default_rng(5)
        vec = rng.standard_normal(8).astype(np.float32)
        x = jnp.asarray(np.tile(vec, (1, 1, 16, 1)))  # same vector at all pos
        q, k = _apply_rope(x, x, 100.0)
        q, k = np.asarray(q), np.asarray(k)
        s = lambda i, j: float(q[0, 0, i] @ k[0, 0, j])
        assert s(3, 1) == pytest.approx(s(10, 8), rel=1e-5)   # same distance
        assert abs(s(3, 1) - s(3, 3)) > 1e-3                  # different distance

    def test_rope_preserves_norm(self):
        import jax.numpy as jnp

        from codesearch_tpu.models.encoder import _apply_rope

        rng = np.random.default_rng(3)
        q = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 2, 16, 8)).astype(np.float32))
        q2, k2 = _apply_rope(q, k, 10000.0)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(q2), axis=-1),
            np.linalg.norm(np.asarray(q), axis=-1), rtol=1e-5,
        )

    def test_local_window_masks_distant_tokens(self):
        """ModernBERT's local layers must not attend beyond the window."""
        import jax.numpy as jnp

        from codesearch_tpu.ops.attention import reference_attention

        rng = np.random.default_rng(4)
        s = 16
        q = jnp.asarray(rng.standard_normal((1, 1, s, 8)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((1, 1, s, 8)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((1, 1, s, 8)).astype(np.float32))
        mask = jnp.ones((1, s), jnp.float32)
        base = np.asarray(reference_attention(q, k, v, mask, window=4))
        # perturb a key/value far outside every window of token 0
        k2 = k.at[0, 0, 10].set(99.0)
        v2 = v.at[0, 0, 10].set(99.0)
        pert = np.asarray(reference_attention(q, k2, v2, mask, window=4))
        np.testing.assert_allclose(pert[0, 0, 0], base[0, 0, 0], rtol=1e-5)
        assert not np.allclose(pert[0, 0, 9], base[0, 0, 9])
