"""Cross-implementation encoder parity vs HuggingFace transformers (torch CPU).

Zero-egress substitute for the SURVEY §7 step-2 gate ("cosine >0.999 vs
ONNX"): build tiny RANDOM-weight HF models, export their state dicts as
safetensors, load them with OUR JAX encoder, and require near-identical
outputs. This validates the architecture math (attention/rope/window/GeGLU/
norm placement) and the checkpoint name mapping — the two things weight
downloads would have tested — against the canonical implementation the real
checkpoints target.

Our forward runs bf16 activations (TPU-native); HF runs f32 — tolerance is
cosine similarity, not elementwise equality.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def _save_torch_state(model, path):
    from safetensors.torch import save_file

    state = {k: v.contiguous() for k, v in model.state_dict().items()}
    # drop non-tensor buffers HF sometimes includes (position_ids etc.)
    state = {k: v for k, v in state.items() if v.dtype.is_floating_point}
    save_file(state, str(path))


@pytest.fixture(scope="module")
def torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


class TestBertParity:
    def test_hidden_and_pooled_match_hf(self, torch, tmp_path):
        from transformers import BertConfig, BertModel

        from codesearch_tpu.models.encoder import encode, encode_hidden, load_safetensors
        from codesearch_tpu.models.registry import ArchConfig

        hf_cfg = BertConfig(
            vocab_size=211, hidden_size=64, num_hidden_layers=3,
            num_attention_heads=4, intermediate_size=128,
            max_position_embeddings=96, type_vocab_size=2,
            hidden_act="gelu", layer_norm_eps=1e-12,
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        )
        hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
        st = tmp_path / "model.safetensors"
        _save_torch_state(hf, st)

        cfg = ArchConfig(vocab_size=211, hidden=64, layers=3, heads=4,
                         intermediate=128, max_len=96)
        params = load_safetensors(st, cfg)

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 211, (2, 24))
        mask = np.ones((2, 24), np.int64)
        mask[1, 18:] = 0

        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(encode_hidden(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), cfg
        ), np.float32)
        # padded positions are unconstrained — compare valid positions only
        assert _cosine(ours[0], ref[0]) > 0.999
        assert _cosine(ours[1, :18], ref[1, :18]) > 0.999

        # pooled path: mean over valid + L2 (what retrieval consumes)
        pooled = np.asarray(encode(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), cfg
        ))
        ref_pool = (ref * mask[:, :, None]).sum(1) / mask.sum(1, keepdims=True)
        ref_pool /= np.linalg.norm(ref_pool, axis=1, keepdims=True)
        for i in range(2):
            assert _cosine(pooled[i], ref_pool[i]) > 0.999


class TestModernBertParity:
    def test_hidden_match_hf(self, torch, tmp_path):
        from transformers import ModernBertConfig, ModernBertModel

        from codesearch_tpu.models.encoder import encode_hidden, load_safetensors
        from codesearch_tpu.models.registry import ArchConfig

        hf_cfg = ModernBertConfig(
            vocab_size=199, hidden_size=64, num_hidden_layers=4,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=128, hidden_activation="gelu",
            global_attn_every_n_layers=3, local_attention=8,
            global_rope_theta=160000.0, local_rope_theta=10000.0,
            norm_eps=1e-5, attention_dropout=0.0, mlp_dropout=0.0,
            embedding_dropout=0.0, attention_bias=False, norm_bias=False,
            mlp_bias=False, classifier_bias=False,
            # defaults point past the tiny test vocab
            pad_token_id=0, bos_token_id=1, eos_token_id=2,
            cls_token_id=3, sep_token_id=4, reference_compile=False,
        )
        hf = ModernBertModel(hf_cfg).eval()
        st = tmp_path / "model.safetensors"
        _save_torch_state(hf, st)

        cfg = ArchConfig(
            vocab_size=199, hidden=64, layers=4, heads=4, intermediate=96,
            max_len=128, layer_norm_eps=1e-5, arch_style="modernbert",
            rope_base=160000.0, rope_base_local=10000.0, local_window=8,
            global_every=3,
        )
        params = load_safetensors(st, cfg)

        rng = np.random.default_rng(1)
        ids = rng.integers(0, 199, (2, 24))
        mask = np.ones((2, 24), np.int64)

        with torch.no_grad():
            ref = hf(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        ours = np.asarray(encode_hidden(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32), cfg
        ), np.float32)
        assert _cosine(ours, ref) > 0.999


class TestCrossEncoderParity:
    def test_pair_scores_match_hf(self, torch, tmp_path):
        """score_pairs logits vs BertForSequenceClassification (the real
        reranker head shape: pooler tanh + classifier)."""
        import json

        from transformers import BertConfig, BertForSequenceClassification

        from codesearch_tpu.models.cross_encoder import CrossEncoder

        hf_cfg = BertConfig(
            vocab_size=2048, hidden_size=48, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=96,
            max_position_embeddings=64, type_vocab_size=2, num_labels=1,
            hidden_act="gelu", attention_probs_dropout_prob=0.0,
            hidden_dropout_prob=0.0,
        )
        hf = BertForSequenceClassification(hf_cfg).eval()
        d = tmp_path / "jina-reranker-v1-turbo-en"
        d.mkdir()
        _save_torch_state(hf, d / "model.safetensors")
        (d / "config.json").write_text(json.dumps({
            "vocab_size": 2048, "hidden_size": 48, "num_hidden_layers": 2,
            "num_attention_heads": 4, "intermediate_size": 96,
            "max_position_embeddings": 64, "type_vocab_size": 2,
            "hidden_act": "gelu", "layer_norm_eps": 1e-12,
            "position_embedding_type": "absolute",
        }))
        ce = CrossEncoder(tmp_path)
        assert ce.pretrained

        # drive the same token ids through both (bypass tokenizers: feed
        # the model path directly with the hashing tokenizer's output)
        query, docs = "parse config file", ["fn parse_config()", "fn draw()"]
        ours = ce.score_pairs(query, docs)

        q_ids = ce.tokenizer.encode(query).ids
        ref_scores = []
        for doc in docs:
            d_ids = ce.tokenizer.encode(doc).ids[1:]
            ids = (q_ids + d_ids)[:64]
            tt = ([0] * len(q_ids) + [1] * len(d_ids))[:64]
            with torch.no_grad():
                logit = hf(
                    input_ids=torch.tensor([ids]),
                    token_type_ids=torch.tensor([tt]),
                    attention_mask=torch.ones(1, len(ids), dtype=torch.long),
                ).logits.numpy()[0, 0]
            ref_scores.append(1.0 / (1.0 + np.exp(-logit)))
        np.testing.assert_allclose(ours, ref_scores, rtol=0.05, atol=0.01)
