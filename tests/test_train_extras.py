"""Training extras: pair mining, batching, checkpoint round-trip."""

from pathlib import Path

import jax
import numpy as np
import pytest

from codesearch_tpu.chunker import Chunk, ChunkKind
from codesearch_tpu.models.tokenizer import HashingTokenizer
from codesearch_tpu.train.data import batches, mine_pairs
from codesearch_tpu.train.checkpoint import latest_step, restore_checkpoint, save_checkpoint


def _chunk(content, docstring=None, signature=None, context=()):
    return Chunk(
        content=content, start_line=0, end_line=5, kind=ChunkKind.FUNCTION,
        path="x.py", docstring=docstring, signature=signature,
        context=list(context),
    )


class TestPairMining:
    def test_mine_pairs(self):
        chunks = [
            _chunk("def f():\n    return read_config(path)\n" * 2,
                   docstring="Parse the configuration file",
                   signature="def f(path: str) -> Config",
                   context=["File: x.py", "Function: f"]),
            _chunk("tiny"),  # too short — skipped
        ]
        pairs = mine_pairs(chunks)
        assert len(pairs) == 3
        assert pairs[0].query == "Parse the configuration file"

    def test_batches_shapes(self):
        chunks = [
            _chunk(f"def f{i}():\n    return {i} + compute_thing()\n" * 2,
                   signature=f"def f{i}() -> int")
            for i in range(10)
        ]
        pairs = mine_pairs(chunks)
        tk = HashingTokenizer(max_len=32)
        got = list(batches(pairs, tk, batch_size=4, max_len=32))
        assert got
        b = got[0]
        assert b["query_ids"].shape == (4, 32)
        assert b["doc_mask"].sum() > 0


class TestHashFinetune:
    def test_aligns_disjoint_vocabulary(self):
        """Queries and docs share NO tokens — random projection gives ~0
        cosine; fine-tuning must align them."""
        import numpy as np

        from codesearch_tpu.models.hash_embedder import HashEmbedder
        from codesearch_tpu.train.data import Pair
        from codesearch_tpu.train.hash_finetune import finetune_table

        concepts = [
            ("upload retry logic", "fn resend_failed_transfer(att: u32)"),
            ("parse configuration", "fn load_settings_toml(path: &str)"),
            ("draw graphics", "fn render_canvas_frame(buf: &mut Pixels)"),
            ("database connection", "fn open_sql_pool(dsn: &str)"),
        ]
        pairs = [Pair(query=q, doc=d) for q, d in concepts] * 16

        e = HashEmbedder(64)
        trained, losses = finetune_table(
            e.table, pairs, epochs=30, batch_size=16, learning_rate=0.3
        )
        assert losses[-1] < losses[0], f"no descent: {losses[0]} → {losses[-1]}"

        e.table = trained
        docs = e.embed_texts([d for _, d in concepts])
        correct = 0
        for i, (q, _) in enumerate(concepts):
            sims = docs @ e.embed_texts([q])[0]
            correct += int(np.argmax(sims) == i)
        assert correct >= 3, f"only {correct}/4 aligned after finetune"

    def test_too_few_pairs_noop(self):
        from codesearch_tpu.models.hash_embedder import make_table
        from codesearch_tpu.train.hash_finetune import finetune_table

        t = make_table(32)
        out, losses = finetune_table(t, [], epochs=2)
        assert losses == []


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
        opt = {"m": np.zeros((2, 3), np.float32)}
        save_checkpoint(tmp_path, 5, params, opt)
        assert latest_step(tmp_path) == 5
        template = {"params": {"w": np.zeros((2, 3), np.float32)},
                    "opt_state": {"m": np.zeros((2, 3), np.float32)},
                    "step": 0}
        restored = restore_checkpoint(tmp_path, 5, template)
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]), params["w"])
        assert int(restored["step"]) == 5

    def test_latest_of_many(self, tmp_path):
        params = {"w": np.ones(2, np.float32)}
        save_checkpoint(tmp_path, 1, params, {})
        save_checkpoint(tmp_path, 10, params, {})
        assert latest_step(tmp_path) == 10

    def test_latest_empty(self, tmp_path):
        assert latest_step(tmp_path / "none") is None
