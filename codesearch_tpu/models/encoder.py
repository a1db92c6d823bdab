"""Pure-functional JAX BERT-family text encoder.

The reference runs BERT ONNX graphs on CPU via ort (embed/embedder.rs:233);
here the encoder is a param-pytree + pure-function design (idiomatic JAX:
trivially jit/pjit/shard_map-able, safetensors-mappable):

- ``init_params(rng, cfg)`` — deterministic random init (used when no
  weights exist in this zero-egress environment; throughput identical).
- ``load_safetensors(path, cfg)`` — maps HF BERT checkpoint names onto the
  pytree for exact-parity inference when weights are provided.
- ``encode(params, ids, mask, cfg)`` — jitted forward: embeddings → N
  transformer layers (fused attention op) → masked-mean or CLS pooling →
  L2 norm. bfloat16 activations, fp32 layernorm/softmax accumulation.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import fused_encoder_attention
from .registry import ArchConfig


def _dense_init(rng, shape, scale=0.02):
    return (jax.random.normal(rng, shape) * scale).astype(jnp.float32)


def init_params(rng: jax.Array, cfg: ArchConfig) -> dict:
    keys = jax.random.split(rng, 6 + cfg.layers)
    params: dict = {
        "embeddings": {
            "word": _dense_init(keys[0], (cfg.vocab_size, cfg.hidden)),
            "position": _dense_init(keys[1], (cfg.max_len, cfg.hidden)),
            "token_type": _dense_init(keys[2], (cfg.type_vocab_size, cfg.hidden)),
            "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[6 + i], 8)
        h, m = cfg.hidden, cfg.intermediate
        params["layers"].append(
            {
                "q_w": _dense_init(k[0], (h, h)), "q_b": jnp.zeros((h,)),
                "k_w": _dense_init(k[1], (h, h)), "k_b": jnp.zeros((h,)),
                "v_w": _dense_init(k[2], (h, h)), "v_b": jnp.zeros((h,)),
                "o_w": _dense_init(k[3], (h, h)), "o_b": jnp.zeros((h,)),
                "attn_ln_scale": jnp.ones((h,)), "attn_ln_bias": jnp.zeros((h,)),
                "mlp_in_w": _dense_init(k[4], (h, m)), "mlp_in_b": jnp.zeros((m,)),
                "mlp_out_w": _dense_init(k[5], (m, h)), "mlp_out_b": jnp.zeros((h,)),
                "mlp_ln_scale": jnp.ones((h,)), "mlp_ln_bias": jnp.zeros((h,)),
            }
        )
    return params


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _encoder_layer(x: jax.Array, mask: jax.Array, p: dict, cfg: ArchConfig) -> jax.Array:
    b, s, h = x.shape
    nh = cfg.heads
    dh = h // nh

    def proj(w, bias):
        return (x @ w.astype(x.dtype) + bias.astype(x.dtype)).reshape(b, s, nh, dh).transpose(0, 2, 1, 3)

    q = proj(p["q_w"], p["q_b"])
    k = proj(p["k_w"], p["k_b"])
    v = proj(p["v_w"], p["v_b"])
    attn = fused_encoder_attention(q, k, v, mask)           # [B, H, S, Dh]
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
    attn = attn @ p["o_w"].astype(x.dtype) + p["o_b"].astype(x.dtype)
    x = _layer_norm(x + attn, p["attn_ln_scale"], p["attn_ln_bias"], cfg.layer_norm_eps)
    mlp = x @ p["mlp_in_w"].astype(x.dtype) + p["mlp_in_b"].astype(x.dtype)
    mlp = jax.nn.gelu(mlp, approximate=False)
    mlp = mlp @ p["mlp_out_w"].astype(x.dtype) + p["mlp_out_b"].astype(x.dtype)
    x = _layer_norm(x + mlp, p["mlp_ln_scale"], p["mlp_ln_bias"], cfg.layer_norm_eps)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode_hidden(
    params: dict,
    input_ids: jax.Array,
    attention_mask: jax.Array,
    cfg: ArchConfig,
    token_type_ids: jax.Array | None = None,
) -> jax.Array:
    """Transformer trunk: [B, S] ids + mask → [B, S, hidden] states."""
    emb = params["embeddings"]
    b, s = input_ids.shape
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(s)][None, :, :]
        + emb["token_type"][tt]
    )
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    x = x.astype(jnp.bfloat16)
    maskf = attention_mask.astype(jnp.float32)
    for p in params["layers"]:
        x = _encoder_layer(x, maskf, p, cfg)
    return x


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
           cfg: ArchConfig) -> jax.Array:
    """Forward: [B, S] ids + mask → [B, hidden] L2-normalized embeddings."""
    x32 = encode_hidden(params, input_ids, attention_mask, cfg).astype(jnp.float32)
    maskf = attention_mask.astype(jnp.float32)
    if cfg.pooling == "cls":
        pooled = x32[:, 0, :]
    else:
        denom = jnp.maximum(jnp.sum(maskf, axis=1, keepdims=True), 1.0)
        pooled = jnp.sum(x32 * maskf[:, :, None], axis=1) / denom
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


# ---------------------------------------------------------------------------
# HF safetensors loading
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = {
    "q_w": "attention.self.query.weight", "q_b": "attention.self.query.bias",
    "k_w": "attention.self.key.weight", "k_b": "attention.self.key.bias",
    "v_w": "attention.self.value.weight", "v_b": "attention.self.value.bias",
    "o_w": "attention.output.dense.weight", "o_b": "attention.output.dense.bias",
    "attn_ln_scale": "attention.output.LayerNorm.weight",
    "attn_ln_bias": "attention.output.LayerNorm.bias",
    "mlp_in_w": "intermediate.dense.weight", "mlp_in_b": "intermediate.dense.bias",
    "mlp_out_w": "output.dense.weight", "mlp_out_b": "output.dense.bias",
    "mlp_ln_scale": "output.LayerNorm.weight", "mlp_ln_bias": "output.LayerNorm.bias",
}


def load_safetensors(path: Path, cfg: ArchConfig) -> dict:
    """Load an HF BERT-family checkpoint (model.safetensors) into the pytree.

    Dense kernels are transposed (HF stores [out, in]; we use x @ W with
    W [in, out]).
    """
    from safetensors import safe_open

    tensors: dict[str, np.ndarray] = {}
    with safe_open(str(path), framework="np") as f:
        for key in f.keys():
            tensors[key] = f.get_tensor(key)

    def get(name: str) -> np.ndarray:
        for prefix in ("", "bert.", "model.", "encoder."):
            if prefix + name in tensors:
                return tensors[prefix + name]
        raise KeyError(f"missing tensor {name!r} (available: {len(tensors)})")

    params: dict = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "position": jnp.asarray(get("embeddings.position_embeddings.weight")),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight")),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias")),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        layer: dict = {}
        for ours, theirs in _HF_LAYER_MAP.items():
            t = jnp.asarray(get(f"encoder.layer.{i}.{theirs}"))
            if ours.endswith("_w"):
                t = t.T
            layer[ours] = t
        params["layers"].append(layer)
    return params


def count_params(params: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
