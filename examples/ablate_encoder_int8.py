"""Encoder int8-matmul ablation (VERDICT r3 item 5b).

Question: at seq 512 the bge-small-arch encoder sustains ~1.5k chunks/s on
one v5e chip, bound by the matmul envelope on h=384-wide shapes. Does
switching the projection matmuls (QKV / attn-out / MLP, ~80% of FLOPs) to
int8×int8→int32 on the MXU buy the ~2× the int8 retrieval floor suggests —
or does the dh=32 / h=384 shape wall dominate so dtype doesn't matter?

Method: time `encode` as-is (bf16 activations) vs a variant whose dense
layers run dynamic-quantized int8 (per-row activation scales × per-column
weight scales), and report speedup + embedding cosine drift vs the bf16
reference. Run on the real chip:

    python examples/ablate_encoder_int8.py [--seq 512] [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    import codesearch_tpu  # noqa: F401 (compile cache)
    from codesearch_tpu.models.encoder import encode, init_params, _layer_norm
    from codesearch_tpu.models.registry import MODELS
    from codesearch_tpu.ops.attention import fused_encoder_attention
    from codesearch_tpu.utils.device import wait_for_warmup

    cfg = MODELS["bge-small"].arch
    params = init_params(jax.random.PRNGKey(3), cfg)
    rng = jax.random.PRNGKey(4)
    ids = jax.random.randint(rng, (args.batch, args.seq), 0, cfg.vocab_size, jnp.int32)
    mask = jnp.ones((args.batch, args.seq), jnp.int32)
    wait_for_warmup(timeout=600)

    # ---- int8 projection path --------------------------------------------
    def quant_w(w):
        """Per-column int8 weight quant: w [in, out] → (w8, col_scale)."""
        w = jnp.asarray(w, jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
        return jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8), s

    def dense_i8(x, w8, s_col, b=None):
        """x [.., in] f32/bf16 → dynamic per-row int8 × w8 → f32 rescale."""
        xf = x.astype(jnp.float32)
        shp = xf.shape
        x2 = xf.reshape(-1, shp[-1])
        s_row = jnp.maximum(jnp.max(jnp.abs(x2), axis=1), 1e-12) / 127.0
        x8 = jnp.clip(jnp.round(x2 / s_row[:, None]), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.float32) * (s_row[:, None] * s_col[None, :])
        if b is not None:
            y = y + b
        return y.reshape(*shp[:-1], -1).astype(x.dtype)

    def quantize_params(params):
        q = {"embeddings": params["embeddings"], "layers": []}
        for p in params["layers"]:
            qkv_w = jnp.concatenate([p["q_w"], p["k_w"], p["v_w"]], axis=1)
            qkv_b = jnp.concatenate([p["q_b"], p["k_b"], p["v_b"]])
            lp = {
                "qkv": quant_w(qkv_w), "qkv_b": qkv_b,
                "o": quant_w(p["o_w"]), "o_b": p["o_b"],
                "mi": quant_w(p["mlp_in_w"]), "mi_b": p["mlp_in_b"],
                "mo": quant_w(p["mlp_out_w"]), "mo_b": p["mlp_out_b"],
                "attn_ln_scale": p["attn_ln_scale"], "attn_ln_bias": p["attn_ln_bias"],
                "mlp_ln_scale": p["mlp_ln_scale"], "mlp_ln_bias": p["mlp_ln_bias"],
            }
            q["layers"].append(lp)
        return q

    @functools.partial(jax.jit, static_argnames=())
    def encode_i8(qparams, input_ids, attention_mask):
        emb = qparams["embeddings"]
        b, s = input_ids.shape
        maskf = attention_mask.astype(jnp.float32)
        tt = jnp.zeros_like(input_ids)
        x = emb["word"][input_ids] + emb["token_type"][tt]
        x = x + emb["position"][jnp.arange(s)][None, :, :]
        x = _layer_norm(x, emb["ln_scale"], emb["ln_bias"], cfg.layer_norm_eps)
        x = x.astype(jnp.bfloat16)
        nh, dh = cfg.heads, cfg.hidden // cfg.heads
        for p in qparams["layers"]:
            qkv = dense_i8(x, *p["qkv"], p["qkv_b"])
            q, k, v = (
                t.reshape(b, s, nh, dh).transpose(0, 2, 1, 3)
                for t in jnp.split(qkv, 3, axis=-1)
            )
            attn = fused_encoder_attention(q, k, v, maskf)
            attn = attn.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden)
            attn = dense_i8(attn, *p["o"], p["o_b"])
            x = _layer_norm(x + attn, p["attn_ln_scale"], p["attn_ln_bias"],
                            cfg.layer_norm_eps)
            mlp = dense_i8(x, *p["mi"], p["mi_b"])
            mlp = jax.nn.gelu(mlp, approximate=False)
            mlp = dense_i8(mlp, *p["mo"], p["mo_b"])
            x = _layer_norm(x + mlp, p["mlp_ln_scale"], p["mlp_ln_bias"],
                            cfg.layer_norm_eps)
        x32 = x.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(maskf, axis=1, keepdims=True), 1.0)
        pooled = x32[:, 0, :] if cfg.pooling == "cls" else (
            jnp.sum(x32 * maskf[:, :, None], axis=1) / denom
        )
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

    def bench(fn, *a, reps=8):
        out = fn(*a)
        out.block_until_ready()
        t0 = time.time()
        for _ in range(reps):
            out = fn(*a)
        out.block_until_ready()
        return args.batch * reps / (time.time() - t0), out

    cps_bf16, ref = bench(lambda i, m: encode(params, i, m, cfg), ids, mask)
    qp = quantize_params(params)
    cps_i8, got = bench(lambda i, m: encode_i8(qp, i, m), ids, mask)

    ref = np.asarray(ref)
    got = np.asarray(got)
    cos = float(np.mean(np.sum(ref * got, axis=1)))
    print(f"seq={args.seq} batch={args.batch} backend={jax.default_backend()}")
    print(f"bf16:  {cps_bf16:8.0f} chunks/s")
    print(f"int8:  {cps_i8:8.0f} chunks/s   ({cps_i8 / cps_bf16:.2f}x)")
    print(f"cosine(bf16, int8) = {cos:.5f}")
    return 0


if __name__ == "__main__":
    from codesearch_tpu.utils.output import install_native_log_filter

    install_native_log_filter()  # drop spurious XLA AOT-cache stderr spam
    sys.exit(main())
