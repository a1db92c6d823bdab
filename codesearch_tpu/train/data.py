"""Contrastive pair mining from an indexed corpus.

Builds (query, document) training pairs without any labeling service:
- docstring ↔ code body (the docstring describes the code),
- signature ↔ body (name/type structure ↔ implementation),
- breadcrumb context ↔ content.

Pairs feed train.contrastive with in-batch negatives. Tokenization uses the
model's tokenizer; batches are padded to fixed tiers (recompile-bounded).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..chunker import Chunk


@dataclass
class Pair:
    query: str
    doc: str


def mine_pairs(chunks: list[Chunk], min_doc_len: int = 24) -> list[Pair]:
    pairs: list[Pair] = []
    for c in chunks:
        body = c.content
        if len(body) < min_doc_len:
            continue
        if c.docstring and len(c.docstring) >= 12:
            pairs.append(Pair(query=c.docstring, doc=body))
        if c.signature and len(c.signature) >= 8:
            pairs.append(Pair(query=c.signature, doc=body))
        if len(c.context) >= 2:
            pairs.append(Pair(query=" > ".join(c.context[1:]), doc=body))
    return pairs


def mine_hard_negatives(
    pairs: list[Pair], k: int = 4, dims: int = 384,
) -> list[list[str]]:
    """Retriever-mined hard negatives, one list per pair: the top-k OTHER
    documents the hash retriever ranks for the pair's query.

    A cross-encoder reranker only ever scores documents the retriever
    already ranked highly — all topically close to the query. Training
    against random in-batch negatives teaches surface topicality and
    nothing about discriminating WITHIN a candidate list (measured: the
    easy-negative CE degraded top-1 vs no-rerank); the standard fix is to
    train against the retriever's own confusions."""
    seen: dict[str, int] = {}
    docs: list[str] = []
    for p in pairs:
        if p.doc not in seen:
            seen[p.doc] = len(docs)
            docs.append(p.doc)
    if len(docs) < 3:
        return [[] for _ in pairs]
    from ..models.hash_embedder import HashEmbedder

    he = HashEmbedder(dims)
    d_emb = he.embed_texts(docs)                      # [N, d]
    out: list[list[str]] = []
    # batch the query side (one device call per slab)
    bs = 256
    for i in range(0, len(pairs), bs):
        slab = pairs[i : i + bs]
        q_emb = he.embed_texts([p.query for p in slab])
        sims = q_emb @ d_emb.T                        # [B, N]
        top = np.argsort(-sims, axis=1)[:, : k + 1]
        for row, p in enumerate(slab):
            own = seen[p.doc]
            negs = [docs[j] for j in top[row] if j != own][:k]
            out.append(negs)
    return out


def batches(
    pairs: list[Pair],
    tokenizer,
    batch_size: int,
    max_len: int = 128,
    seed: int = 0,
):
    """Yield token batches: dict of [B, max_len] int32 arrays."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        q_ids = np.zeros((batch_size, max_len), np.int32)
        q_mask = np.zeros((batch_size, max_len), np.int32)
        d_ids = np.zeros((batch_size, max_len), np.int32)
        d_mask = np.zeros((batch_size, max_len), np.int32)
        for row, j in enumerate(idx):
            q = tokenizer.encode(pairs[j].query).ids[:max_len]
            d = tokenizer.encode(pairs[j].doc).ids[:max_len]
            q_ids[row, : len(q)] = q
            q_mask[row, : len(q)] = 1
            d_ids[row, : len(d)] = d
            d_mask[row, : len(d)] = 1
        yield {
            "query_ids": q_ids, "query_mask": q_mask,
            "doc_ids": d_ids, "doc_mask": d_mask,
        }
