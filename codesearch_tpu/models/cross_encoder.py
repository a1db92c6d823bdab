"""Cross-encoder reranker model (Jina-reranker-v1-turbo class).

The reference scores (query, doc) pairs one-by-one on CPU via ort
(rerank/neural.rs:24-74, ~1.7s per query). Here all pairs score in one
batched device forward: BERT over ``[CLS] query [SEP] doc [SEP]`` with
segment ids, CLS pooler + linear head → logit → sigmoid.

The architecture is read from the checkpoint's OWN ``config.json`` (drop
the HF repo's config.json + model.safetensors + tokenizer into the models
cache dir) — layer count/hidden/heads are never guessed; ALiBi-positioned
checkpoints (JinaBERT-v2 family) are supported via position_type.

Zero-egress fallback: without local weights, pair scores come from the
deterministic hash embedder's cosine (a bi-encoder proxy) so the rerank
pipeline stays functional end-to-end; ``mode`` labels which path ran so
degraded ranking is visible in --scores / MCP output.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .registry import ArchConfig
from .tokenizer import load_tokenizer

# fallback shape when a checkpoint ships without config.json (BERT-small
# class); with a config.json present this is fully overridden
CROSS_ENCODER_ARCH = ArchConfig(
    vocab_size=30522, hidden=384, layers=6, heads=12, intermediate=1536,
    max_len=512, pooling="cls",
)


def arch_from_hf_config(model_dir: Path) -> ArchConfig | None:
    """Build an ArchConfig from an HF BertConfig-style config.json. Returns
    None when the file is absent; raises ValueError for architectures the
    encoder cannot run (so stale indexes aren't silently mis-ranked)."""
    p = model_dir / "config.json"
    if not p.exists():
        return None
    raw = json.loads(p.read_text())
    pos = raw.get("position_embedding_type", "absolute")
    if pos not in ("absolute", "alibi"):
        raise ValueError(f"unsupported position_embedding_type: {pos!r}")
    act = raw.get("hidden_act", "gelu")
    if act not in ("gelu", "gelu_new", "gelu_python"):
        raise ValueError(f"unsupported hidden_act: {act!r}")
    return ArchConfig(
        vocab_size=int(raw.get("vocab_size", 30522)),
        hidden=int(raw.get("hidden_size", 384)),
        layers=int(raw.get("num_hidden_layers", 6)),
        heads=int(raw.get("num_attention_heads", 12)),
        intermediate=int(raw.get("intermediate_size", 1536)),
        max_len=min(int(raw.get("max_position_embeddings", 512)), 8192),
        type_vocab_size=max(int(raw.get("type_vocab_size", 2)), 1),
        layer_norm_eps=float(raw.get("layer_norm_eps", 1e-12)),
        pooling="cls",
        position_type=pos,
    )


class CrossEncoder:
    def __init__(self, models_dir: Path | None = None, name: str = "jina-reranker-v1-turbo-en"):
        from . import encoder as enc
        from ..utils.logger import get_logger

        log = get_logger("cross_encoder")
        self.cfg = CROSS_ENCODER_ARCH
        self.name = name
        model_dir = (models_dir / name) if models_dir is not None else None
        st = model_dir / "model.safetensors" if model_dir is not None else None
        if (st is None or not st.exists()) and models_dir is not None:
            # zero-egress fallback chain: a cross-encoder trained locally on
            # mined pairs (`codesearch train --cross-encoder`) ranks above
            # the bi-encoder proxy; a downloaded checkpoint still wins
            local = models_dir / "local-cross-encoder"
            if (local / "model.safetensors").exists():
                model_dir = local
                st = local / "model.safetensors"
                self.name = "local-cross-encoder"
        if st is not None and st.exists():
            try:
                cfg = arch_from_hf_config(model_dir)
                if cfg is not None:
                    self.cfg = cfg
            except ValueError as e:
                log.warning("reranker %s unusable (%s); using bi-encoder proxy",
                            name, e)
                st = None
        self.tokenizer = load_tokenizer(
            model_dir if model_dir is not None and model_dir.exists() else None,
            lowercase=True,
            max_len=self.cfg.max_len,
            vocab_size=self.cfg.vocab_size,
        )
        if st is not None and st.exists():
            self.params = enc.load_safetensors(st, self.cfg)
            self._head = self._load_head(st)
            self.pretrained = True
        else:
            self.params = None
            self._head = None
            self.pretrained = False
            from .hash_embedder import HashEmbedder

            self._proxy = HashEmbedder(384)

    @property
    def mode(self) -> str:
        """'cross-encoder' (real batched pair forward) or
        'proxy-bi-encoder' (zero-egress cosine fallback)."""
        return "cross-encoder" if self.pretrained else "proxy-bi-encoder"

    def _load_head(self, st: Path):
        import jax.numpy as jnp
        from safetensors import safe_open

        head = {}
        with safe_open(str(st), framework="np") as f:
            keys = set(f.keys())
            def grab(*names):
                for n in names:
                    if n in keys:
                        return jnp.asarray(f.get_tensor(n))
                return None
            head["pooler_w"] = grab("bert.pooler.dense.weight", "pooler.dense.weight")
            head["pooler_b"] = grab("bert.pooler.dense.bias", "pooler.dense.bias")
            head["cls_w"] = grab("classifier.weight")
            head["cls_b"] = grab("classifier.bias")
        return head

    def score_pairs(self, query: str, docs: list[str]) -> np.ndarray:
        """Sigmoid relevance scores for all (query, doc) pairs, one batch."""
        if not docs:
            return np.zeros((0,), np.float32)
        if not self.pretrained:
            q = self._proxy.embed_texts([query])[0]
            d = self._proxy.embed_texts(docs)
            cos = d @ q
            return _sigmoid(4.0 * cos)  # map cosine to (0,1) with slope
        return self._score_pairs_model(query, docs)

    def _score_pairs_model(self, query: str, docs: list[str]) -> np.ndarray:
        import jax.numpy as jnp

        from . import encoder as enc

        q_ids = self.tokenizer.encode(query).ids
        batches_ids, batches_tt = [], []
        max_len = 0
        seg_b = 1 if self.cfg.type_vocab_size > 1 else 0
        for d in docs:
            d_ids = self.tokenizer.encode(d).ids[1:]  # drop duplicate CLS
            ids = (q_ids + d_ids)[: self.cfg.max_len]
            tt = ([0] * len(q_ids) + [seg_b] * len(d_ids))[: self.cfg.max_len]
            batches_ids.append(ids)
            batches_tt.append(tt)
            max_len = max(max_len, len(ids))
        max_len = 1 << max(4, (max_len - 1).bit_length())
        max_len = min(max_len, self.cfg.max_len)
        n = len(docs)
        ids = np.zeros((n, max_len), np.int32)
        tt = np.zeros((n, max_len), np.int32)
        mask = np.zeros((n, max_len), np.int32)
        for i, (a, b) in enumerate(zip(batches_ids, batches_tt)):
            L = min(len(a), max_len)
            ids[i, :L] = a[:L]
            tt[i, :L] = b[:L]
            mask[i, :L] = 1
        hidden = enc.encode_hidden(
            self.params, jnp.asarray(ids), jnp.asarray(mask), self.cfg,
            token_type_ids=jnp.asarray(tt),
        )  # [n, S, H]
        cls = hidden[:, 0, :].astype(jnp.float32)
        h = self._head
        pooled = jnp.tanh(cls @ h["pooler_w"].T + h["pooler_b"]) if h["pooler_w"] is not None else cls
        logits = pooled @ h["cls_w"].T + h["cls_b"]  # [n, 1]
        return _sigmoid(np.asarray(logits)[:, 0])


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return (1.0 / (1.0 + np.exp(-np.asarray(x, np.float64)))).astype(np.float32)
