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


class TestHardNegatives:
    def test_mined_negatives_are_confusable_and_not_self(self):
        from codesearch_tpu.train.data import Pair, mine_hard_negatives

        pairs = [
            Pair("parse configuration values",
                 "def parse_config(path):\n    return read(path)"),
            Pair("parse yaml configuration",
                 "def parse_yaml_config(path):\n    return yaml.load(path)"),
            Pair("walk the directory tree",
                 "def walk_tree(root):\n    return list(root.rglob('*'))"),
            Pair("render a triangle",
                 "def draw_triangle(canvas):\n    canvas.fill()"),
        ]
        negs = mine_hard_negatives(pairs, k=2)
        assert len(negs) == len(pairs)
        for p, nl in zip(pairs, negs):
            assert p.doc not in nl
            assert 0 < len(nl) <= 2
        # the config query's hardest negative is the OTHER config doc,
        # not the graphics one
        assert "yaml" in negs[0][0]

    def test_train_accepts_hard_negatives(self, tmp_path):
        from codesearch_tpu.models.registry import ArchConfig
        from codesearch_tpu.train.cross_encoder_train import train_cross_encoder
        from codesearch_tpu.train.data import Pair

        pairs = [Pair(f"query {i} topic_{i % 3}",
                      f"def handler_{i}(x):\n    return topic_{i % 3}(x)")
                 for i in range(12)]
        negs = [[pairs[(i + 1) % 12].doc] for i in range(12)]
        _, _, _, losses = train_cross_encoder(
            pairs,
            cfg=ArchConfig(vocab_size=2048, hidden=32, layers=1, heads=4,
                           intermediate=64, max_len=64, pooling="cls"),
            epochs=2, batch_size=6, hard_negatives=negs,
        )
        assert losses and all(np.isfinite(v) for v in losses)
