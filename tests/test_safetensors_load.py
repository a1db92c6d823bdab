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
