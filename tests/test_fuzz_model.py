"""Model-based randomized tests: drive the stores and the chunker with
seeded random operation sequences and check their behavior against simple
Python reference models. These catch state-machine bugs (tombstone
accounting, segment merges, reopen divergence, span arithmetic) that
example-based tests miss. Deterministic: fixed seeds, no time dependence.

Reference analog: the reference leans on proptest-style randomized input
coverage in its Rust test habits; this is the model-checking tier of
SURVEY.md §4.
"""

from __future__ import annotations

import random
import string
from pathlib import Path

import numpy as np

from codesearch_tpu.fts import FtsStore
from codesearch_tpu.vectordb import ChunkMetadata, VectorStore

# vocabulary wide enough that no term's document frequency crosses the
# BM25 stopword cap (MAX_DF_RATIO / the 64-doc floor) — the model below
# assumes every term is scored, which only holds for sub-cap terms
_BASE = [
    "parse", "config", "walk", "tree", "buffer", "index", "token",
    "matrix", "query", "chunk", "socket", "widget", "metric", "schema",
    "branch", "vector", "posting", "render", "merge", "flush",
]
WORDS = [f"{w}{i}" for w in _BASE for i in range(25)]


def _doc(rng: random.Random) -> str:
    n = rng.randint(3, 12)
    return " ".join(rng.choice(WORDS) for _ in range(n))


class TestFtsModel:
    """Random add/delete/commit/reopen sequences vs a dict model.

    Checked invariants after every commit:
    - single-term search returns EXACTLY the live docs containing the term
      (as a set), with positive scores in non-increasing order;
    - reopening the store from disk returns identical results.
    """

    def _check(self, fts: FtsStore, model: dict[int, str], rng: random.Random):
        for term in rng.sample(WORDS, 6):
            got = fts.search(term, limit=10_000)
            got_ids = {r.chunk_id for r in got}
            want = {cid for cid, text in model.items()
                    if term in text.split()}
            assert got_ids == want, (term, got_ids ^ want)
            scores = [r.score for r in got]
            assert all(s > 0 for s in scores)
            assert scores == sorted(scores, reverse=True)

    def test_random_ops_match_model(self, tmp_path):
        rng = random.Random(0xC0DE)
        root = tmp_path / "fts"
        fts = FtsStore(root)
        fts.device_min_docs = 10**9   # host scoring: the model's territory
        model: dict[int, str] = {}
        next_id = 1
        for step in range(60):
            op = rng.random()
            if op < 0.55 or not model:
                rows = []
                for _ in range(rng.randint(1, 30)):
                    text = _doc(rng)
                    rows.append((next_id, text, f"f{next_id % 7}.py",
                                 None, "function"))
                    model[next_id] = text
                    next_id += 1
                fts.add_chunks(rows)
            elif op < 0.85:
                victim = rng.choice(list(model))
                fts.delete_chunk(victim)
                del model[victim]
            else:
                fts.commit()
                self._check(fts, model, rng)
        fts.commit()
        self._check(fts, model, rng)
        # reopen: disk state must answer identically
        fts2 = FtsStore(root)
        fts2.device_min_docs = 10**9
        self._check(fts2, model, rng)
        for term in WORDS:
            a = [(r.chunk_id, round(r.score, 6)) for r in fts.search(term, 100)]
            b = [(r.chunk_id, round(r.score, 6)) for r in fts2.search(term, 100)]
            assert a == b, term

    def test_exact_matches_model(self, tmp_path):
        """search_exact returns only live docs containing the identifier."""
        rng = random.Random(7)
        fts = FtsStore(tmp_path / "fts")
        model: dict[int, str] = {}
        rows = []
        for cid in range(1, 400):
            text = _doc(rng) + (" special_ident" if cid % 3 == 0 else "")
            rows.append((cid, text, f"f{cid % 5}.py", None, "function"))
            model[cid] = text
        fts.add_chunks(rows)
        for cid in range(3, 200, 9):
            fts.delete_chunk(cid)
            del model[cid]
        fts.commit()
        got = {r.chunk_id for r in fts.search_exact("special_ident", limit=10_000)}
        want = {cid for cid, t in model.items() if "special_ident" in t}
        assert got == want


class TestVectorStoreModel:
    """Random insert/delete/save/reopen vs a dict of live vectors.

    Invariant: searching with a live chunk's own (unit) vector returns that
    chunk at rank 1 (exact search, self-similarity 1.0 strictly dominates
    random vectors); dead chunks never appear in any result.
    """

    def test_random_ops_self_retrieval(self, tmp_path):
        rng = np.random.default_rng(42)
        pyrng = random.Random(42)
        store = VectorStore(tmp_path / "db", dims=64)
        model: dict[int, np.ndarray] = {}
        for step in range(25):
            op = pyrng.random()
            if op < 0.6 or not model:
                n = pyrng.randint(1, 40)
                vecs = rng.standard_normal((n, 64)).astype(np.float32)
                vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
                metas = [ChunkMetadata(
                    path=f"m{pyrng.randint(0, 9)}.py", content=f"c{step}-{i}",
                    start_line=0, end_line=1, kind="function",
                ) for i in range(n)]
                ids = store.insert_chunks_with_ids(vecs, metas)
                for cid, v in zip(ids, vecs):
                    model[cid] = v
            elif op < 0.85:
                victims = pyrng.sample(list(model), min(len(model), 5))
                store.delete_chunks(victims)
                for v in victims:
                    del model[v]
            else:
                store.save()
        store.save()
        live = set(model)
        for cid in pyrng.sample(sorted(live), min(len(live), 12)):
            res = store.search(model[cid], 3)
            assert res and res[0].chunk_id == cid, cid
            assert all(r.chunk_id in live for r in res)
        # reopen from disk: same property
        store2 = VectorStore(tmp_path / "db", dims=64)
        for cid in pyrng.sample(sorted(live), min(len(live), 8)):
            res = store2.search(model[cid], 3)
            assert res and res[0].chunk_id == cid, cid
            meta = store2.get_chunk(cid)
            assert meta is not None and meta.content == store.get_chunk(cid).content


class TestChunkerFuzz:
    """Crash-freedom + span sanity over adversarial inputs for every
    supported language: whatever bytes arrive, chunking must not raise,
    spans must be ordered and lie inside the source's line range, and
    chunks must be non-empty. (Content is NOT asserted to be a verbatim
    substring: split parts legitimately carry a "[Part i/N]" header.)"""

    def test_random_inputs_never_crash(self):
        from codesearch_tpu.chunker import SemanticChunker
        from codesearch_tpu.fileio.language import Language

        rng = random.Random(1234)
        chunker = SemanticChunker(50, 2000, 5)
        alphabet = string.printable + "λχσπ∑"
        fragments = [
            "def f(:\n", "class {", '"""', "'''", "/*", "*/", "//", "#",
            "fn main(", "} } }", "impl X for", "describe('x', () => {",
            "SELECT * FROM", "\x00\x01", "qué", "🦀", "\\", "'",
            '"', "`", "\n\n\n", "    ", "\t}",
        ]
        for lang in Language:
            for trial in range(4):
                parts = [rng.choice(fragments) for _ in range(rng.randint(1, 40))]
                parts += [rng.choice(alphabet) * rng.randint(1, 30)]
                rng.shuffle(parts)
                src = "".join(parts)
                chunks = chunker.chunk_semantic(lang, Path("fuzz.x"), src)
                n_lines = src.count("\n") + 1
                for c in chunks:
                    assert 0 <= c.start_line <= c.end_line <= n_lines, (
                        lang, c.start_line, c.end_line, n_lines
                    )
                    assert c.content  # non-empty
