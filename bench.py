"""Headline benchmark (run by the driver on real TPU hardware).

Measures single-chip exact cosine top-10 retrieval throughput over a
1M-chunk corpus (384d, bf16, device-resident) — the workload class of
BASELINE.json ("QPS + recall@10 on 1M code chunks"). Recall@10 is exactly
1.0 by construction: the engine does exact brute-force search (the
reference's arroy ANN is approximate).

Baseline: the reference answers one hybrid query in ~75 ms on CPU
(README.md:691) ⇒ ~13.3 QPS single-stream. vs_baseline = our QPS / 13.3.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.
"""

from __future__ import annotations

import json
import sys
import time

import os

# Scale knobs (BASELINE.json configs): default = 1M bf16; BENCH_ROWS=10485760
# BENCH_INT8=1 covers the 10M-chunk int8 single-chip configuration.
N_ROWS = int(os.environ.get("BENCH_ROWS", 1 << 20))  # tile-aligned → fused kernel
DIMS = int(os.environ.get("BENCH_DIMS", 384))
Q_BATCH = int(os.environ.get("BENCH_Q", 64))
INT8 = bool(int(os.environ.get("BENCH_INT8", "0")))
TOP_K = 10
BASELINE_QPS = 1000.0 / 75.0  # reference: ~75 ms/query hybrid, CPU


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import codesearch_tpu  # noqa: F401  (configures the compilation cache)
    from codesearch_tpu.ops.topk import cosine_topk
    from codesearch_tpu.utils.device import wait_for_warmup

    t_setup = time.time()
    backend = jax.default_backend()
    # warm the device→host transfer path (one-time tunnel init) while the
    # corpus generates on device
    wait_for_warmup(timeout=0)

    # synthetic corpus, generated on device (no host transfer)
    key = jax.random.PRNGKey(0)
    valid = jnp.ones((N_ROWS,), bool)
    queries = jax.random.normal(jax.random.PRNGKey(1), (Q_BATCH, DIMS), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)

    if INT8:
        # generate int8 directly (a bf16 intermediate at 10M rows would OOM);
        # constant row scale — ranking characteristics are unchanged
        from codesearch_tpu.ops.topk import cosine_topk_int8

        # generate per-block: the PRNG's uint32 intermediates OOM at 10M rows
        block = min(N_ROWS, 1 << 20)
        corpus_q = jnp.zeros((N_ROWS, DIMS), jnp.int8)
        for b in range(N_ROWS // block):
            bits = jax.random.bits(
                jax.random.fold_in(key, b), (block, DIMS), jnp.uint8
            )
            corpus_q = jax.lax.dynamic_update_slice(
                corpus_q, jax.lax.bitcast_convert_type(bits, jnp.int8),
                (b * block, 0),
            )
        row_scale = jnp.full((N_ROWS,), 1.0 / 127.0, jnp.float32)
        corpus_q.block_until_ready()
        corpus = None

        def run(q, k):
            return cosine_topk_int8(q, corpus_q, row_scale, valid, k)
    else:
        corpus = jax.random.normal(key, (N_ROWS, DIMS), jnp.bfloat16)
        norms = jnp.maximum(
            jnp.linalg.norm(corpus.astype(jnp.float32), axis=1, keepdims=True), 1e-6
        )
        corpus = (corpus.astype(jnp.float32) / norms).astype(jnp.bfloat16)
        corpus.block_until_ready()

        def run(q, k):
            return cosine_topk(q, corpus, valid, k)

    # compile + correctness probe: a corpus row must retrieve itself top-1
    if INT8:
        probe = corpus_q[123:124].astype(jnp.float32)
        probe = probe / jnp.linalg.norm(probe)
    else:
        probe = corpus[123:124].astype(jnp.float32)
    pv, pi = run(probe, TOP_K)
    wait_for_warmup(timeout=600)
    pi_host = int(jax.device_get(pi)[0, 0])
    assert pi_host == 123, f"exactness probe failed: {pi_host}"
    setup_s = time.time() - t_setup

    # timed steady-state loop
    iters_warm, iters = 3, 15
    for _ in range(iters_warm):
        v, i = run(queries, TOP_K)
    v.block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        v, i = run(queries, TOP_K)
    v.block_until_ready()
    dt = time.time() - t0
    qps = Q_BATCH * iters / dt
    ms_per_batch = dt / iters * 1000

    # secondary: embedding throughput, chunks/s
    # (a) weights-free hash model
    from codesearch_tpu.models.hash_embedder import embed_features, make_table

    table = make_table(DIMS)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1024, 128), 0, 65536, jnp.int32)
    ws = jnp.ones((1024, 128), jnp.float32)
    out = embed_features(table, ids, ws)
    out.block_until_ready()
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        out = embed_features(table, ids, ws)
    out.block_until_ready()
    embed_cps = 1024 * reps / (time.time() - t0)

    # (b) flagship BERT-class encoder (bge-small arch, 12L/384H), seq 128 —
    # the reference's CPU ONNX path embeds ~51 chunks/s (demongrep_vs_osgrep)
    from codesearch_tpu.models.encoder import encode, init_params
    from codesearch_tpu.models.registry import MODELS

    cfg = MODELS["bge-small"].arch
    params = init_params(jax.random.PRNGKey(3), cfg)
    bsz, seq = 256, 128
    bids = jax.random.randint(jax.random.PRNGKey(4), (bsz, seq), 0, cfg.vocab_size, jnp.int32)
    bmask = jnp.ones((bsz, seq), jnp.int32)
    out_b = encode(params, bids, bmask, cfg)
    out_b.block_until_ready()
    t0 = time.time()
    reps_b = 5
    for _ in range(reps_b):
        out_b = encode(params, bids, bmask, cfg)
    out_b.block_until_ready()
    bert_cps = bsz * reps_b / (time.time() - t0)

    print(
        json.dumps(
            {
                "metric": (
                    f"exact_top10_qps_{N_ROWS // 1024 // 1024}M_chunks_{DIMS}d_"
                    + ("int8" if INT8 else "bf16")
                ),
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / BASELINE_QPS, 1),
                "details": {
                    "backend": backend,
                    "recall_at_10": 1.0,
                    "batch": Q_BATCH,
                    "ms_per_64q_batch": round(ms_per_batch, 2),
                    "embed_chunks_per_s_hash_model": round(embed_cps, 0),
                    "embed_chunks_per_s_bge_small_arch": round(bert_cps, 0),
                    "embed_vs_cpu_onnx_51cps": round(bert_cps / 51.0, 1),
                    "setup_s": round(setup_s, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
