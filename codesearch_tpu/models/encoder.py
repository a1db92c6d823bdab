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


# ---------------------------------------------------------------------------
# rotary position embeddings (Nomic, ModernBERT — GPT-NeoX rotate-half form)
# ---------------------------------------------------------------------------

def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(q: jax.Array, k: jax.Array, base: float):
    """Rotary embedding over [B, H, S, Dh] (full rotary fraction, fp32
    angles — bf16 phase error compounds over long sequences)."""
    dh = q.shape[-1]
    s = q.shape[2]
    inv = 1.0 / (base ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    freqs = jnp.outer(jnp.arange(s, dtype=jnp.float32), inv)    # [S, Dh/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)              # [S, Dh]
    cos = jnp.cos(emb)[None, None].astype(q.dtype)
    sin = jnp.sin(emb)[None, None].astype(q.dtype)
    return q * cos + _rotate_half(q) * sin, k * cos + _rotate_half(k) * sin


def init_params(rng: jax.Array, cfg: ArchConfig) -> dict:
    if cfg.arch_style == "nomic":
        return _init_params_nomic(rng, cfg)
    if cfg.arch_style == "modernbert":
        return _init_params_modernbert(rng, cfg)
    keys = jax.random.split(rng, 6 + cfg.layers)
    params: dict = {
        "embeddings": {
            "word": _dense_init(keys[0], (cfg.vocab_size, cfg.hidden)),
            "token_type": _dense_init(keys[2], (cfg.type_vocab_size, cfg.hidden)),
            "ln_scale": jnp.ones((cfg.hidden,), jnp.float32),
            "ln_bias": jnp.zeros((cfg.hidden,), jnp.float32),
        },
        "layers": [],
    }
    if cfg.position_type != "alibi":
        params["embeddings"]["position"] = _dense_init(
            keys[1], (cfg.max_len, cfg.hidden)
        )
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


def _init_params_nomic(rng: jax.Array, cfg: ArchConfig) -> dict:
    """nomic-bert-2048: rotary, SwiGLU gated MLP, bias-free attn/MLP,
    post-norm (nomic-ai/nomic-embed-text-v1; ref registry embedder.rs:24-31)."""
    keys = jax.random.split(rng, 3 + cfg.layers)
    h, m = cfg.hidden, cfg.intermediate
    params: dict = {
        "embeddings": {
            "word": _dense_init(keys[0], (cfg.vocab_size, h)),
            "token_type": _dense_init(keys[1], (cfg.type_vocab_size, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
            "ln_bias": jnp.zeros((h,), jnp.float32),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[3 + i], 5)
        params["layers"].append({
            "qkv_w": _dense_init(k[0], (h, 3 * h)),
            "out_w": _dense_init(k[1], (h, h)),
            "norm1_scale": jnp.ones((h,)), "norm1_bias": jnp.zeros((h,)),
            "fc11_w": _dense_init(k[2], (h, m)),
            "fc12_w": _dense_init(k[3], (h, m)),
            "fc2_w": _dense_init(k[4], (m, h)),
            "norm2_scale": jnp.ones((h,)), "norm2_bias": jnp.zeros((h,)),
        })
    return params


def _init_params_modernbert(rng: jax.Array, cfg: ArchConfig) -> dict:
    """ModernBERT: pre-norm, GeGLU, bias-free, rotary; layer 0 has no
    attention norm (the embedding norm immediately precedes it)."""
    keys = jax.random.split(rng, 2 + cfg.layers)
    h, m = cfg.hidden, cfg.intermediate
    params: dict = {
        "embeddings": {
            "word": _dense_init(keys[0], (cfg.vocab_size, h)),
            "ln_scale": jnp.ones((h,), jnp.float32),
        },
        "final_ln_scale": jnp.ones((h,), jnp.float32),
        "layers": [],
    }
    for i in range(cfg.layers):
        k = jax.random.split(keys[2 + i], 4)
        layer = {
            "qkv_w": _dense_init(k[0], (h, 3 * h)),
            "o_w": _dense_init(k[1], (h, h)),
            "wi_w": _dense_init(k[2], (h, 2 * m)),
            "wo_w": _dense_init(k[3], (m, h)),
            "mlp_ln_scale": jnp.ones((h,)),
        }
        if i > 0:
            layer["attn_ln_scale"] = jnp.ones((h,))
        params["layers"].append(layer)
    return params


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _encoder_layer(
    x: jax.Array, mask: jax.Array, p: dict, cfg: ArchConfig,
    bias2d: jax.Array | None = None,
) -> jax.Array:
    b, s, h = x.shape
    nh = cfg.heads
    dh = h // nh

    # fused QKV: one [h, 3h] matmul feeds the MXU instead of three [h, h]
    # (the concat of the stored kernels is CSE'd by XLA across calls)
    qkv_w = jnp.concatenate(
        [p["q_w"], p["k_w"], p["v_w"]], axis=1
    ).astype(x.dtype)
    qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]]).astype(x.dtype)
    qkv = x @ qkv_w + qkv_b
    q, k, v = (
        t.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
        for t in jnp.split(qkv, 3, axis=-1)
    )
    attn = fused_encoder_attention(q, k, v, mask, bias2d=bias2d)  # [B, H, S, Dh]
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
    attn = attn @ p["o_w"].astype(x.dtype) + p["o_b"].astype(x.dtype)
    x = _layer_norm(x + attn, p["attn_ln_scale"], p["attn_ln_bias"], cfg.layer_norm_eps)
    mlp = x @ p["mlp_in_w"].astype(x.dtype) + p["mlp_in_b"].astype(x.dtype)
    mlp = jax.nn.gelu(mlp, approximate=False)
    mlp = mlp @ p["mlp_out_w"].astype(x.dtype) + p["mlp_out_b"].astype(x.dtype)
    x = _layer_norm(x + mlp, p["mlp_ln_scale"], p["mlp_ln_bias"], cfg.layer_norm_eps)
    return x


def _split_heads(t: jax.Array, nh: int) -> jax.Array:
    b, s, h = t.shape
    return t.reshape(b, s, nh, h // nh).transpose(0, 2, 1, 3)


def _nomic_layer(x: jax.Array, maskf: jax.Array, p: dict, cfg: ArchConfig) -> jax.Array:
    b, s, h = x.shape
    qkv = x @ p["qkv_w"].astype(x.dtype)                     # fused, bias-free
    q, k, v = (_split_heads(t, cfg.heads) for t in jnp.split(qkv, 3, axis=-1))
    q, k = _apply_rope(q, k, cfg.rope_base)
    attn = fused_encoder_attention(q, k, v, maskf)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
    attn = attn @ p["out_w"].astype(x.dtype)
    x = _layer_norm(x + attn, p["norm1_scale"], p["norm1_bias"], cfg.layer_norm_eps)
    # SwiGLU: fc11(x) gated by silu(fc12(x)) → fc2
    y = x @ p["fc11_w"].astype(x.dtype)
    gate = x @ p["fc12_w"].astype(x.dtype)
    mlp = (y * jax.nn.silu(gate)) @ p["fc2_w"].astype(x.dtype)
    return _layer_norm(x + mlp, p["norm2_scale"], p["norm2_bias"], cfg.layer_norm_eps)


def _modernbert_layer(
    x: jax.Array, maskf: jax.Array, p: dict, cfg: ArchConfig, layer_idx: int
) -> jax.Array:
    b, s, h = x.shape
    zero = jnp.zeros((h,), jnp.float32)
    is_global = layer_idx % cfg.global_every == 0
    window = 0 if is_global else cfg.local_window
    base = cfg.rope_base if is_global else cfg.rope_base_local
    xa = x if layer_idx == 0 else _layer_norm(
        x, p["attn_ln_scale"], zero, cfg.layer_norm_eps
    )
    qkv = xa @ p["qkv_w"].astype(x.dtype)
    q, k, v = (_split_heads(t, cfg.heads) for t in jnp.split(qkv, 3, axis=-1))
    q, k = _apply_rope(q, k, base)
    attn = fused_encoder_attention(q, k, v, maskf, window=window)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
    x = x + attn @ p["o_w"].astype(x.dtype)
    xm = _layer_norm(x, p["mlp_ln_scale"], zero, cfg.layer_norm_eps)
    # GeGLU: Wi → (input, gate); Wo(gelu(input) * gate)
    inp, gate = jnp.split(xm @ p["wi_w"].astype(x.dtype), 2, axis=-1)
    mlp = (jax.nn.gelu(inp, approximate=False) * gate) @ p["wo_w"].astype(x.dtype)
    return x + mlp


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
    maskf = attention_mask.astype(jnp.float32)
    if cfg.arch_style == "modernbert":
        x = emb["word"][input_ids]
        zero = jnp.zeros((cfg.hidden,), jnp.float32)
        x = _layer_norm(x, emb["ln_scale"], zero, cfg.layer_norm_eps)
        x = x.astype(jnp.bfloat16)
        for i, p in enumerate(params["layers"]):
            x = _modernbert_layer(x, maskf, p, cfg, i)
        return _layer_norm(x, params["final_ln_scale"], zero, cfg.layer_norm_eps)
    if cfg.arch_style == "nomic":
        tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
        x = emb["word"][input_ids] + emb["token_type"][tt]
        x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
        x = x.astype(jnp.bfloat16)
        for p in params["layers"]:
            x = _nomic_layer(x, maskf, p, cfg)
        return x
    tt = token_type_ids if token_type_ids is not None else jnp.zeros_like(input_ids)
    x = emb["word"][input_ids] + emb["token_type"][tt]
    bias2d = None
    if cfg.position_type == "alibi":
        from ..ops.attention import alibi_bias

        bias2d = alibi_bias(cfg.heads, s)
    else:
        x = x + emb["position"][jnp.arange(s)][None, :, :]
    x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
    x = x.astype(jnp.bfloat16)
    for p in params["layers"]:
        x = _encoder_layer(x, maskf, p, cfg, bias2d=bias2d)
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


def _read_safetensors(path: Path):
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

    return tensors, get


def load_safetensors(path: Path, cfg: ArchConfig) -> dict:
    """Load an HF checkpoint (model.safetensors) into the pytree for the
    config's architecture style. Dense kernels are transposed (HF stores
    [out, in]; we use x @ W with W [in, out]).
    """
    if cfg.arch_style == "nomic":
        return _load_safetensors_nomic(path, cfg)
    if cfg.arch_style == "modernbert":
        return _load_safetensors_modernbert(path, cfg)
    tensors, get = _read_safetensors(path)

    params: dict = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(get("embeddings.LayerNorm.weight")),
            "ln_bias": jnp.asarray(get("embeddings.LayerNorm.bias")),
        },
        "layers": [],
    }
    if cfg.position_type != "alibi":
        params["embeddings"]["position"] = jnp.asarray(
            get("embeddings.position_embeddings.weight")
        )
    for i in range(cfg.layers):
        layer: dict = {}
        for ours, theirs in _HF_LAYER_MAP.items():
            t = jnp.asarray(get(f"encoder.layer.{i}.{theirs}"))
            if ours.endswith("_w"):
                t = t.T
            layer[ours] = t
        params["layers"].append(layer)
    return params


def _load_safetensors_nomic(path: Path, cfg: ArchConfig) -> dict:
    """nomic-bert-2048 checkpoint names (nomic-ai/nomic-embed-text-v1):
    emb_ln.*, encoder.layers.{i}.attn.Wqkv/out_proj, mlp.fc11/fc12/fc2,
    norm1/norm2."""
    tensors, get = _read_safetensors(path)
    params: dict = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.word_embeddings.weight")),
            "token_type": jnp.asarray(get("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(get("emb_ln.weight")),
            "ln_bias": jnp.asarray(get("emb_ln.bias")),
        },
        "layers": [],
    }
    for i in range(cfg.layers):
        L = f"encoder.layers.{i}."
        params["layers"].append({
            "qkv_w": jnp.asarray(get(L + "attn.Wqkv.weight")).T,
            "out_w": jnp.asarray(get(L + "attn.out_proj.weight")).T,
            "norm1_scale": jnp.asarray(get(L + "norm1.weight")),
            "norm1_bias": jnp.asarray(get(L + "norm1.bias")),
            "fc11_w": jnp.asarray(get(L + "mlp.fc11.weight")).T,
            "fc12_w": jnp.asarray(get(L + "mlp.fc12.weight")).T,
            "fc2_w": jnp.asarray(get(L + "mlp.fc2.weight")).T,
            "norm2_scale": jnp.asarray(get(L + "norm2.weight")),
            "norm2_bias": jnp.asarray(get(L + "norm2.bias")),
        })
    return params


def _load_safetensors_modernbert(path: Path, cfg: ArchConfig) -> dict:
    """ModernBERT checkpoint names (answerdotai/ModernBERT-large /
    lightonai/modernbert-embed-large): embeddings.tok_embeddings,
    layers.{i}.attn.Wqkv/Wo, attn_norm (absent on layer 0), mlp.Wi/Wo,
    mlp_norm, final_norm — all norms bias-free."""
    tensors, get = _read_safetensors(path)
    params: dict = {
        "embeddings": {
            "word": jnp.asarray(get("embeddings.tok_embeddings.weight")),
            "ln_scale": jnp.asarray(get("embeddings.norm.weight")),
        },
        "final_ln_scale": jnp.asarray(get("final_norm.weight")),
        "layers": [],
    }
    for i in range(cfg.layers):
        L = f"layers.{i}."
        layer = {
            "qkv_w": jnp.asarray(get(L + "attn.Wqkv.weight")).T,
            "o_w": jnp.asarray(get(L + "attn.Wo.weight")).T,
            "wi_w": jnp.asarray(get(L + "mlp.Wi.weight")).T,
            "wo_w": jnp.asarray(get(L + "mlp.Wo.weight")).T,
            "mlp_ln_scale": jnp.asarray(get(L + "mlp_norm.weight")),
        }
        if i > 0:
            layer["attn_ln_scale"] = jnp.asarray(get(L + "attn_norm.weight"))
        params["layers"].append(layer)
    return params


def count_params(params: dict) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
