"""Zero-egress cross-encoder training for the neural reranker.

The reference reranks with a downloaded Jina cross-encoder over ONNX
(rerank/neural.rs:24-74). This environment has no egress, so the
``--rerank`` default falls back to a labeled bi-encoder proxy
(models/cross_encoder.py). This module closes that gap the TPU-native way:
train a SMALL real cross-encoder (BERT trunk + CLS pooler + linear head)
from scratch on pairs mined from the indexed corpus (train/data.mine_pairs)
and export it in HF safetensors layout, so ``rerank_mode="cross-encoder"``
runs an actual batched pair forward end-to-end with zero downloads — and a
real downloaded checkpoint remains a drop-in replacement.

Training: binary relevance on (query, doc) pairs — positives are the mined
pairs, negatives pair each query with a random other doc — BCE on the
sigmoid logit, Adam, jit'd full-batch steps. Pair token layout is
IDENTICAL to CrossEncoder._score_pairs_model (query ids + doc ids minus
its CLS, segment ids 0/1) so there is no train/serve skew.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from ..models.registry import ArchConfig
from ..models.tokenizer import load_tokenizer
from ..utils.logger import get_logger
from .data import Pair

log = get_logger("cross_encoder_train")

# name CrossEncoder falls back to when the default checkpoint is absent
LOCAL_CE_NAME = "local-cross-encoder"

# small-but-real trunk: trains in ~a minute on one chip, scores thousands
# of pairs per second at serve time
SMALL_CE_CFG = ArchConfig(
    vocab_size=30522, hidden=192, layers=3, heads=6, intermediate=768,
    max_len=256, pooling="cls",
)


def _pair_batch(tok, queries: list[str], docs: list[str], max_len: int):
    """[CLS] query … [SEP] doc … — same packing as the serving path."""
    ids_l, tt_l = [], []
    longest = 0
    for q, d in zip(queries, docs):
        q_ids = tok.encode(q).ids
        d_ids = tok.encode(d).ids[1:]
        ids = (q_ids + d_ids)[:max_len]
        tt = ([0] * len(q_ids) + [1] * len(d_ids))[:max_len]
        ids_l.append(ids)
        tt_l.append(tt)
        longest = max(longest, len(ids))
    longest = min(1 << max(4, (longest - 1).bit_length()), max_len)
    n = len(ids_l)
    ids = np.zeros((n, longest), np.int32)
    tt = np.zeros((n, longest), np.int32)
    mask = np.zeros((n, longest), np.int32)
    for i, (a, b) in enumerate(zip(ids_l, tt_l)):
        L = min(len(a), longest)
        ids[i, :L] = a[:L]
        tt[i, :L] = b[:L]
        mask[i, :L] = 1
    return ids, tt, mask


def init_head(rng, cfg: ArchConfig):
    import jax
    import jax.numpy as jnp

    k1, k2 = jax.random.split(rng)
    h = cfg.hidden
    return {
        # HF orientation ([out, in]) — matches CrossEncoder's `x @ w.T`
        "pooler_w": (jax.random.normal(k1, (h, h)) * 0.02).astype(jnp.float32),
        "pooler_b": jnp.zeros((h,), jnp.float32),
        "cls_w": (jax.random.normal(k2, (1, h)) * 0.02).astype(jnp.float32),
        "cls_b": jnp.zeros((1,), jnp.float32),
    }


def train_cross_encoder(
    pairs: list[Pair],
    cfg: ArchConfig = SMALL_CE_CFG,
    epochs: int = 3,
    batch_size: int = 32,
    learning_rate: float = 3e-4,
    seed: int = 0,
    hard_negatives: list[list[str]] | None = None,
    on_epoch=None,
):
    """Returns (params, head, tokenizer, losses). ``pairs`` are positives;
    in-batch shuffled docs are easy negatives, and — when provided —
    ``hard_negatives[i]`` are retriever-confusable documents for pair i
    (train/data.mine_hard_negatives): the reranker's whole job is
    discriminating within a retrieved candidate list, so it must train
    against the retriever's own confusions."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import encoder as enc

    tok = load_tokenizer(None, lowercase=True, max_len=cfg.max_len,
                         vocab_size=cfg.vocab_size)
    rng0 = jax.random.PRNGKey(seed)
    params = enc.init_params(rng0, cfg)
    head = init_head(jax.random.fold_in(rng0, 1), cfg)

    def logits_fn(params, head, ids, tt, mask):
        hid = enc.encode_hidden(params, ids, mask, cfg, token_type_ids=tt)
        cls = hid[:, 0, :].astype(jnp.float32)
        pooled = jnp.tanh(cls @ head["pooler_w"].T + head["pooler_b"])
        return (pooled @ head["cls_w"].T + head["cls_b"])[:, 0]

    def loss_fn(trainable, ids, tt, mask, labels):
        params, head = trainable
        logits = logits_fn(params, head, ids, tt, mask)
        return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))

    tx = optax.adam(learning_rate)
    trainable = (params, head)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, opt_state, ids, tt, mask, labels):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, ids, tt, mask, labels)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(trainable, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    losses: list[float] = []
    eff_bs = max(2, min(batch_size, len(pairs)))
    for _epoch in range(epochs):
        order = rng.permutation(len(pairs))
        epoch_losses = []
        for i in range(0, len(order) - eff_bs + 1, eff_bs):
            take = order[i : i + eff_bs]
            batch = [pairs[j] for j in take]
            qs = [p.query for p in batch]
            docs = [p.doc for p in batch]
            # easy negatives: derangement-ish shuffle of the docs
            neg = docs[1:] + docs[:1]
            all_q = qs + qs
            all_d = docs + neg
            n_neg = len(batch)
            if hard_negatives is not None:
                # one hard negative per positive, cycling through each
                # pair's mined list across epochs
                hq, hd = [], []
                for pos, j in enumerate(take):
                    negs = hard_negatives[j]
                    if negs:
                        hq.append(qs[pos])
                        hd.append(negs[_epoch % len(negs)])
                all_q += hq
                all_d += hd
                n_neg += len(hq)
            ids, tt, mask = _pair_batch(tok, all_q, all_d, cfg.max_len)
            labels = np.concatenate(
                [np.ones(len(batch), np.float32), np.zeros(n_neg, np.float32)]
            )
            import jax.numpy as jnp

            trainable, opt_state, loss = step(
                trainable, opt_state, jnp.asarray(ids), jnp.asarray(tt),
                jnp.asarray(mask), jnp.asarray(labels),
            )
            epoch_losses.append(float(loss))
        if epoch_losses:
            losses.append(float(np.mean(epoch_losses)))
            log.info("cross-encoder epoch %d/%d: loss %.4f",
                     _epoch + 1, epochs, losses[-1])
            if on_epoch is not None:
                on_epoch(_epoch + 1, epochs, losses[-1])
    params, head = trainable
    log.info("cross-encoder train: %d pairs, loss %.4f → %.4f",
             len(pairs), losses[0] if losses else 0.0,
             losses[-1] if losses else 0.0)
    return params, head, tok, losses


def export_cross_encoder(params, head, cfg: ArchConfig, out_dir: Path) -> Path:
    """Write the trained model in HF BERT safetensors layout + config.json
    so models/cross_encoder.CrossEncoder loads it exactly like a downloaded
    checkpoint (dense kernels transposed back to HF's [out, in])."""
    from safetensors.numpy import save_file

    from ..models.encoder import _HF_LAYER_MAP

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    t: dict[str, np.ndarray] = {}

    def put(name, arr):
        t[name] = np.asarray(arr, np.float32)

    emb = params["embeddings"]
    put("embeddings.word_embeddings.weight", emb["word"])
    put("embeddings.token_type_embeddings.weight", emb["token_type"])
    put("embeddings.position_embeddings.weight", emb["position"])
    put("embeddings.LayerNorm.weight", emb["ln_scale"])
    put("embeddings.LayerNorm.bias", emb["ln_bias"])
    for i, layer in enumerate(params["layers"]):
        for ours, theirs in _HF_LAYER_MAP.items():
            arr = layer[ours]
            if ours.endswith("_w"):
                arr = np.asarray(arr).T
            put(f"encoder.layer.{i}.{theirs}", arr)
    put("bert.pooler.dense.weight", head["pooler_w"])
    put("bert.pooler.dense.bias", head["pooler_b"])
    put("classifier.weight", head["cls_w"])
    put("classifier.bias", head["cls_b"])
    tmp = out_dir / "model.safetensors.tmp"
    save_file(t, str(tmp))
    import os

    os.replace(tmp, out_dir / "model.safetensors")
    config = {
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden,
        "num_hidden_layers": cfg.layers,
        "num_attention_heads": cfg.heads,
        "intermediate_size": cfg.intermediate,
        "max_position_embeddings": cfg.max_len,
        "type_vocab_size": cfg.type_vocab_size,
        "layer_norm_eps": cfg.layer_norm_eps,
        "position_embedding_type": "absolute",
        "hidden_act": "gelu",
        "model_type": "bert",
    }
    (out_dir / "config.json").write_text(json.dumps(config, indent=2))
    return out_dir


def train_and_export(
    pairs: list[Pair],
    models_dir: Path,
    cfg: ArchConfig = SMALL_CE_CFG,
    epochs: int = 3,
    mine_negatives: bool = True,
    neg_depth: int = 4,
    **kw,
) -> tuple[Path, list[float]]:
    """Train on mined pairs and install under ``local-cross-encoder`` in
    the models cache — NeuralReranker picks it up automatically. By
    default retriever-mined hard negatives are added (the easy-negative
    model measured WORSE than no rerank at top-1); ``neg_depth`` is how
    many retriever-confusable negatives are mined per pair (the training
    loop cycles one per epoch, so depth > epochs buys nothing)."""
    if mine_negatives and "hard_negatives" not in kw:
        from .data import mine_hard_negatives

        kw["hard_negatives"] = mine_hard_negatives(pairs, k=neg_depth)
    params, head, _tok, losses = train_cross_encoder(
        pairs, cfg=cfg, epochs=epochs, **kw
    )
    out = export_cross_encoder(params, head, cfg, Path(models_dir) / LOCAL_CE_NAME)
    return out, losses
