"""Cross-framework validation of the Nomic encoder (rotary + SwiGLU).

nomic-bert-2048 has no in-transformers class (its reference implementation is
trust_remote_code), so unlike BERT/ModernBERT (tests/test_hf_parity.py) we
cannot diff against an HF model directly. Instead the two architecture
conventions its config documents are pinned against transformers' OWN
implementations of those conventions, and the full forward is diffed against
an independent torch reference assembled from them:

- rotary_emb_interleaved=false → GPT-NeoX rotate-half rotary: our
  ``_apply_rope`` is compared against
  ``transformers.models.gpt_neox.apply_rotary_pos_emb`` (+ its rotary table).
- activation_function=swiglu with fc11/fc12/fc2 → the flash-attn GatedMlp /
  LLaMA convention ``fc2(silu(gate) * up)`` with fc12 as the gate: compared
  against ``LlamaMLP`` (gate_proj↔fc12, up_proj↔fc11, down_proj↔fc2).
- full stack (token-type embeddings + emb_ln + post-norm blocks, nomic
  checkpoint tensor names) → a hand-rolled torch module built ONLY from
  transformers/torch primitives, exported as safetensors and loaded through
  our ``_load_safetensors_nomic`` → ``encode_hidden``/``encode``.

Reference behavior being matched: embed/embedder.rs:24-31 (nomic registry
entries) running the real ONNX graphs.
"""

import numpy as np
import pytest

import jax.numpy as jnp


def _cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


@pytest.fixture(scope="module")
def torch():
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    return torch


def _neox_cos_sin(torch, base: float, dh: int, s: int):
    """cos/sin tables from transformers' GPT-NeoX rotary (the independent
    implementation of the non-interleaved rotate-half convention)."""
    from transformers import GPTNeoXConfig
    from transformers.models.gpt_neox.modeling_gpt_neox import (
        GPTNeoXRotaryEmbedding,
    )

    cfg = GPTNeoXConfig(
        hidden_size=dh * 2, num_attention_heads=2, rotary_pct=1.0,
        rotary_emb_base=base, max_position_embeddings=max(s, 8),
    )
    rot = GPTNeoXRotaryEmbedding(cfg)
    pos = torch.arange(s)[None, :]
    return rot(torch.zeros(1, 1, dtype=torch.float32), pos)


class TestRopeConvention:
    def test_apply_rope_matches_gpt_neox(self, torch):
        from transformers.models.gpt_neox.modeling_gpt_neox import (
            apply_rotary_pos_emb,
        )

        from codesearch_tpu.models.encoder import _apply_rope

        b, h, s, dh = 2, 3, 17, 16
        rng = np.random.default_rng(0)
        q = rng.normal(size=(b, h, s, dh)).astype(np.float32)
        k = rng.normal(size=(b, h, s, dh)).astype(np.float32)
        for base in (1000.0, 10000.0):
            cos, sin = _neox_cos_sin(torch, base, dh, s)
            rq, rk = apply_rotary_pos_emb(
                torch.tensor(q), torch.tensor(k), cos, sin
            )
            oq, ok = _apply_rope(jnp.asarray(q), jnp.asarray(k), base)
            np.testing.assert_allclose(np.asarray(oq), rq.numpy(),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(ok), rk.numpy(),
                                       rtol=1e-4, atol=1e-4)


class TestSwigluConvention:
    def test_gated_mlp_matches_llama(self, torch):
        """fc2(fc11(x) * silu(fc12(x))) == LlamaMLP with gate_proj=fc12."""
        from transformers import LlamaConfig
        from transformers.models.llama.modeling_llama import LlamaMLP

        h, m = 32, 48
        mlp = LlamaMLP(LlamaConfig(
            hidden_size=h, intermediate_size=m, hidden_act="silu",
            mlp_bias=False,
        )).eval()
        x = torch.randn(5, h)
        with torch.no_grad():
            ref = mlp(x).numpy()

        fc11 = jnp.asarray(mlp.up_proj.weight.detach().numpy()).T
        fc12 = jnp.asarray(mlp.gate_proj.weight.detach().numpy()).T
        fc2 = jnp.asarray(mlp.down_proj.weight.detach().numpy()).T
        xj = jnp.asarray(x.numpy())
        import jax

        ours = (xj @ fc11 * jax.nn.silu(xj @ fc12)) @ fc2
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def _build_torch_nomic(torch, vocab, h, nh, m, layers, eps):
    """Independent torch Nomic reference: attribute names are laid out so
    state_dict() keys equal the real checkpoint's tensor names."""
    import torch.nn as nn
    import torch.nn.functional as F
    from transformers.models.gpt_neox.modeling_gpt_neox import (
        apply_rotary_pos_emb,
    )

    class Attn(nn.Module):
        def __init__(self):
            super().__init__()
            self.Wqkv = nn.Linear(h, 3 * h, bias=False)
            self.out_proj = nn.Linear(h, h, bias=False)

        def forward(self, x, cos, sin):
            b, s, _ = x.shape
            dh = h // nh
            qkv = self.Wqkv(x)
            q, k, v = (
                t.reshape(b, s, nh, dh).transpose(1, 2)
                for t in qkv.chunk(3, dim=-1)
            )
            q, k = apply_rotary_pos_emb(q, k, cos, sin)
            a = F.scaled_dot_product_attention(q, k, v)
            return self.out_proj(a.transpose(1, 2).reshape(b, s, h))

    class Mlp(nn.Module):
        def __init__(self):
            super().__init__()
            self.fc11 = nn.Linear(h, m, bias=False)   # up
            self.fc12 = nn.Linear(h, m, bias=False)   # gate
            self.fc2 = nn.Linear(m, h, bias=False)

        def forward(self, x):
            return self.fc2(self.fc11(x) * F.silu(self.fc12(x)))

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = Attn()
            self.norm1 = nn.LayerNorm(h, eps=eps)
            self.mlp = Mlp()
            self.norm2 = nn.LayerNorm(h, eps=eps)

        def forward(self, x, cos, sin):
            x = self.norm1(x + self.attn(x, cos, sin))    # post-norm
            return self.norm2(x + self.mlp(x))

    class Embeddings(nn.Module):
        def __init__(self):
            super().__init__()
            self.word_embeddings = nn.Embedding(vocab, h)
            self.token_type_embeddings = nn.Embedding(2, h)

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.ModuleList([Block() for _ in range(layers)])

    class NomicRef(nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = Embeddings()
            self.emb_ln = nn.LayerNorm(h, eps=eps)
            self.encoder = Encoder()

        def forward(self, ids, cos, sin):
            x = (self.embeddings.word_embeddings(ids)
                 + self.embeddings.token_type_embeddings(
                     torch.zeros_like(ids)))
            x = self.emb_ln(x)
            for blk in self.encoder.layers:
                x = blk(x, cos, sin)
            return x

    return NomicRef()


class TestNomicForwardParity:
    def test_full_forward_and_pooling(self, torch, tmp_path):
        from safetensors.torch import save_file

        from codesearch_tpu.models.encoder import (
            encode, encode_hidden, load_safetensors,
        )
        from codesearch_tpu.models.registry import ArchConfig

        vocab, h, nh, m, layers, eps = 211, 64, 4, 96, 3, 1e-12
        base = 1000.0
        ref = _build_torch_nomic(torch, vocab, h, nh, m, layers, eps).eval()
        st = tmp_path / "model.safetensors"
        save_file({k: v.contiguous() for k, v in ref.state_dict().items()},
                  str(st))

        cfg = ArchConfig(vocab_size=vocab, hidden=h, layers=layers, heads=nh,
                         intermediate=m, max_len=64, arch_style="nomic",
                         rope_base=base, layer_norm_eps=eps)
        params = load_safetensors(st, cfg)

        rng = np.random.default_rng(2)
        s = 24
        ids = rng.integers(0, vocab, (2, s))
        mask = np.ones((2, s), np.int64)
        cos, sin = _neox_cos_sin(torch, base, h // nh, s)
        with torch.no_grad():
            hid = ref(torch.tensor(ids), cos, sin).numpy()

        ours = np.asarray(encode_hidden(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            cfg,
        ), np.float32)
        assert _cosine(ours, hid) > 0.999

        # pooled path (nomic pools by masked mean + L2, like the ref default)
        pooled = np.asarray(encode(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            cfg,
        ))
        ref_pool = hid.mean(axis=1)
        ref_pool /= np.linalg.norm(ref_pool, axis=1, keepdims=True)
        for i in range(2):
            assert _cosine(pooled[i], ref_pool[i]) > 0.999
