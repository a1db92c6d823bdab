"""RRF fusion math + neural rerank blending tests (reference:
rerank/mod.rs:242-331, neural.rs:131)."""

import numpy as np
import pytest

from codesearch_tpu.rerank import (
    DEFAULT_RRF_K,
    EXACT_MATCH_RRF_K,
    NeuralReranker,
    rrf_fusion,
    rrf_fusion_with_exact,
    vector_only,
)


class TestRrfMath:
    def test_single_list(self):
        fused = rrf_fusion([(1, 0.9), (2, 0.8)], [], k=20.0)
        assert [f.chunk_id for f in fused] == [1, 2]
        assert fused[0].rrf_score == pytest.approx(1 / 21.0)
        assert fused[1].rrf_score == pytest.approx(1 / 22.0)
        assert fused[0].vector_rank == 1
        assert fused[0].fts_rank is None

    def test_overlap_sums(self):
        fused = rrf_fusion([(1, 0.9), (2, 0.8)], [(2, 5.0), (1, 4.0)], k=20.0)
        by_id = {f.chunk_id: f for f in fused}
        assert by_id[1].rrf_score == pytest.approx(1 / 21 + 1 / 22)
        assert by_id[2].rrf_score == pytest.approx(1 / 22 + 1 / 21)
        assert by_id[1].vector_score == 0.9
        assert by_id[1].fts_score == 4.0

    def test_fts_only_chunk_included(self):
        fused = rrf_fusion([(1, 0.9)], [(9, 3.0)], k=20.0)
        ids = [f.chunk_id for f in fused]
        assert 9 in ids

    def test_exact_boost_dominates(self):
        # an exact match at rank 1 (k=5) outranks vector rank 1 (k=20)
        fused = rrf_fusion_with_exact(
            [(1, 0.99)], [], [(2, 10.0)],
            vector_k=DEFAULT_RRF_K, fts_k=DEFAULT_RRF_K, exact_k=EXACT_MATCH_RRF_K,
        )
        assert fused[0].chunk_id == 2
        assert fused[0].rrf_score == pytest.approx(1 / 6.0)

    def test_combined_fts_exact_score_averaged(self):
        fused = rrf_fusion_with_exact([], [(1, 4.0)], [(1, 2.0)])
        assert fused[0].fts_score == pytest.approx(3.0)

    def test_vector_only_passthrough(self):
        out = vector_only([(5, 0.7), (6, 0.6)])
        assert [o.chunk_id for o in out] == [5, 6]
        assert out[0].rrf_score == 0.7  # raw score, no RRF transform
        assert out[0].vector_rank == 1

    def test_empty_inputs(self):
        assert rrf_fusion([], []) == []
        assert rrf_fusion_with_exact([], [], []) == []


class TestNeuralRerank:
    def test_proxy_scores_order_by_relevance(self):
        r = NeuralReranker()
        ranked = r.rerank(
            "parse the configuration file",
            [(1, "fn parse_config(path) reads the configuration file"),
             (2, "fn draw_triangle(canvas) renders graphics")],
        )
        assert ranked[0][0] == 1
        assert 0.0 <= ranked[0][1] <= 1.0

    def test_blend_weights(self):
        r = NeuralReranker()
        out = r.rerank_and_blend(
            "configuration parsing",
            [(1, "parse configuration file settings"),
             (2, "unrelated graphics rendering")],
            rrf_scores={1: 0.10, 2: 0.05},
        )
        assert out[0].chunk_id == 1
        # final = 0.575·rerank + 0.425·minmax(rrf); chunk 1 has both higher
        assert out[0].final_score > out[1].final_score
        assert out[0].rrf_score == 0.10

    def test_blend_equal_rrf(self):
        r = NeuralReranker()
        out = r.rerank_and_blend("x", [(1, "x y z")], rrf_scores={1: 0.5})
        # single candidate: CE spread is 0 → the confidence gate keeps the
        # retrieval order and final is the normalized rrf (1.0)
        assert out[0].final_score == pytest.approx(1.0, abs=1e-6)

    def test_confidence_gate_keeps_rrf_order_on_flat_scores(self, monkeypatch):
        """When the cross-encoder cannot discriminate (flat sigmoid scores
        across the candidates) the blend must NOT reorder: reordering on
        no signal is pure churn (measured r4: the trained CE tied
        no-rerank while shuffling within ties)."""
        r = NeuralReranker()
        monkeypatch.setattr(
            r.model, "score_pairs", lambda q, docs: [0.502, 0.498, 0.500]
        )
        out = r.rerank_and_blend(
            "q", [(1, "a"), (2, "b"), (3, "c")],
            rrf_scores={1: 0.03, 2: 0.09, 3: 0.06},
        )
        assert [o.chunk_id for o in out] == [2, 3, 1]  # pure RRF order

    def test_confidence_gate_opens_on_spread_scores(self, monkeypatch):
        """A decisive CE (wide spread) applies the reference 57.5/42.5
        blend and can overturn the retrieval order."""
        r = NeuralReranker()
        monkeypatch.setattr(
            r.model, "score_pairs", lambda q, docs: [0.05, 0.95]
        )
        out = r.rerank_and_blend(
            "q", [(1, "a"), (2, "b")], rrf_scores={1: 0.09, 2: 0.03},
        )
        # chunk 2: 0.575·0.95 + 0.425·0.0 = 0.546 > chunk 1: 0.575·0.05
        # + 0.425·1.0 = 0.454
        assert [o.chunk_id for o in out] == [2, 1]
        assert out[0].final_score == pytest.approx(0.575 * 0.95, abs=1e-6)

    def test_gate_counters_track_open_rate(self, monkeypatch):
        """gate_calls/gate_open distinguish 'the CE agrees with retrieval'
        from 'the gate never opened' in benchmark tables."""
        r = NeuralReranker()
        monkeypatch.setattr(
            r.model, "score_pairs", lambda q, docs: [0.502, 0.498]
        )
        r.rerank_and_blend("q", [(1, "a"), (2, "b")], rrf_scores={1: 0.1})
        monkeypatch.setattr(
            r.model, "score_pairs", lambda q, docs: [0.05, 0.95]
        )
        r.rerank_and_blend("q", [(1, "a"), (2, "b")], rrf_scores={1: 0.1})
        assert (r.gate_calls, r.gate_open) == (2, 1)

    def test_empty(self):
        r = NeuralReranker()
        assert r.rerank("q", []) == []
        assert r.rerank_and_blend("q", [], {}) == []


def _write_synthetic_reranker(model_dir, alibi=True):
    """A jina-reranker-class checkpoint: its OWN config.json + BERT-named
    safetensors with a classification head (VERDICT r1 item 6: the real
    pair-scoring path must be exercised with exactly-shaped weights)."""
    import json

    import numpy as np
    from safetensors.numpy import save_file

    model_dir.mkdir(parents=True, exist_ok=True)
    h, L, heads, inter, vocab = 32, 2, 4, 64, 200
    (model_dir / "config.json").write_text(json.dumps({
        "architectures": ["BertForSequenceClassification"],
        "vocab_size": vocab, "hidden_size": h, "num_hidden_layers": L,
        "num_attention_heads": heads, "intermediate_size": inter,
        "max_position_embeddings": 512, "type_vocab_size": 2,
        "layer_norm_eps": 1e-12, "hidden_act": "gelu",
        "position_embedding_type": "alibi" if alibi else "absolute",
    }))
    rng = np.random.default_rng(7)
    t = {}

    def add(name, shape):
        t[name] = (rng.standard_normal(shape) * 0.05).astype(np.float32)

    add("embeddings.word_embeddings.weight", (vocab, h))
    if not alibi:
        add("embeddings.position_embeddings.weight", (512, h))
    add("embeddings.token_type_embeddings.weight", (2, h))
    add("embeddings.LayerNorm.weight", (h,)); add("embeddings.LayerNorm.bias", (h,))
    for i in range(L):
        P = f"encoder.layer.{i}."
        for qkv in ("query", "key", "value"):
            add(P + f"attention.self.{qkv}.weight", (h, h))
            add(P + f"attention.self.{qkv}.bias", (h,))
        add(P + "attention.output.dense.weight", (h, h))
        add(P + "attention.output.dense.bias", (h,))
        add(P + "attention.output.LayerNorm.weight", (h,))
        add(P + "attention.output.LayerNorm.bias", (h,))
        add(P + "intermediate.dense.weight", (inter, h))
        add(P + "intermediate.dense.bias", (inter,))
        add(P + "output.dense.weight", (h, inter))
        add(P + "output.dense.bias", (h,))
        add(P + "output.LayerNorm.weight", (h,))
        add(P + "output.LayerNorm.bias", (h,))
    add("bert.pooler.dense.weight", (h, h)); add("bert.pooler.dense.bias", (h,))
    add("classifier.weight", (1, h)); add("classifier.bias", (1,))
    save_file(t, str(model_dir / "model.safetensors"))


class TestCrossEncoderCheckpointPath:
    def test_score_pairs_model_runs(self, tmp_path):
        import numpy as np

        from codesearch_tpu.models.cross_encoder import CrossEncoder

        _write_synthetic_reranker(tmp_path / "jina-reranker-v1-turbo-en")
        ce = CrossEncoder(tmp_path)
        assert ce.pretrained and ce.mode == "cross-encoder"
        assert ce.cfg.layers == 2 and ce.cfg.heads == 4
        assert ce.cfg.position_type == "alibi"
        scores = ce.score_pairs("parse the config", ["fn parse_config()", "fn draw()"])
        assert scores.shape == (2,)
        assert np.isfinite(scores).all() and ((0 < scores) & (scores < 1)).all()

    def test_rejects_unsupported_arch(self, tmp_path):
        import json

        from codesearch_tpu.models.cross_encoder import CrossEncoder, arch_from_hf_config

        d = tmp_path / "jina-reranker-v1-turbo-en"
        _write_synthetic_reranker(d)
        cfgd = json.loads((d / "config.json").read_text())
        cfgd["position_embedding_type"] = "relative_key"
        (d / "config.json").write_text(json.dumps(cfgd))
        import pytest as _pytest

        with _pytest.raises(ValueError):
            arch_from_hf_config(d)
        ce = CrossEncoder(tmp_path)  # degrades to the proxy, loudly
        assert not ce.pretrained and ce.mode == "proxy-bi-encoder"

    def test_rerank_through_search_pipeline(self, tmp_path, tmp_repo):
        """search(--rerank) end-to-end over the synthetic checkpoint."""
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.models.cross_encoder import CrossEncoder
        from codesearch_tpu.rerank.neural import NeuralReranker
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        _write_synthetic_reranker(tmp_path / "ce" / "jina-reranker-v1-turbo-en")
        stats = index(tmp_repo, IndexOptions(quiet=True))
        sess = SearchSession(stats.db_path, readonly=True)
        sess.reranker = NeuralReranker(CrossEncoder(tmp_path / "ce"))
        resp = sess.search("parse the configuration file",
                           SearchOptions(limit=5, rerank=True))
        assert resp.hits
        assert resp.rerank_mode == "cross-encoder"

    def test_proxy_mode_is_labeled(self, tmp_repo):
        from codesearch_tpu.index.pipeline import IndexOptions, index
        from codesearch_tpu.search.pipeline import SearchOptions, SearchSession

        stats = index(tmp_repo, IndexOptions(quiet=True))
        sess = SearchSession(stats.db_path, readonly=True)
        resp = sess.search("parse the configuration file",
                           SearchOptions(limit=5, rerank=True))
        assert resp.rerank_mode == "proxy-bi-encoder"


class TestTrainedLocalCrossEncoder:
    """Round-3 (VERDICT item 6): a small cross-encoder trained zero-egress
    on mined pairs must export in HF layout, be auto-discovered as the
    `local-cross-encoder` fallback, and run rerank_mode=cross-encoder."""

    def _pairs(self, n=24):
        from codesearch_tpu.train.data import Pair

        verbs = ["parse", "render", "merge", "flush", "scan", "load"]
        nouns = ["config", "tree", "buffer", "token", "matrix", "query"]
        out = []
        for i in range(n):
            v, o = verbs[i % 6], nouns[(i // 6) % 6]
            out.append(Pair(
                query=f"{v} the {o} value",
                doc=(f"def {v}_{o}(arg):\n"
                     f"    return arg.{o} + compute_{o}(arg)\n"),
            ))
        return out

    def test_train_export_discover_score(self, tmp_path):
        from codesearch_tpu.models.cross_encoder import CrossEncoder
        from codesearch_tpu.models.registry import ArchConfig
        from codesearch_tpu.train.cross_encoder_train import train_and_export

        tiny = ArchConfig(vocab_size=2048, hidden=32, layers=2, heads=4,
                          intermediate=64, max_len=64, pooling="cls")
        out, losses = train_and_export(
            self._pairs(), tmp_path / "models", cfg=tiny, epochs=2,
            batch_size=8,
        )
        assert losses and losses[-1] <= losses[0] + 1e-6
        assert (out / "model.safetensors").exists()
        assert (out / "config.json").exists()
        # default-name checkpoint absent → falls back to the trained one
        ce = CrossEncoder(tmp_path / "models")
        assert ce.pretrained and ce.mode == "cross-encoder"
        assert ce.name == "local-cross-encoder"
        scores = ce.score_pairs("parse the config value",
                                ["def parse_config(arg): ...",
                                 "class Unrelated: pass"])
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert ((scores > 0) & (scores < 1)).all()

    def test_downloaded_checkpoint_still_wins(self, tmp_path):
        """A real checkpoint under the default name must take precedence
        over the locally-trained fallback."""
        from codesearch_tpu.models.cross_encoder import CrossEncoder
        from codesearch_tpu.models.registry import ArchConfig
        from codesearch_tpu.train.cross_encoder_train import train_and_export

        tiny = ArchConfig(vocab_size=2048, hidden=32, layers=2, heads=4,
                          intermediate=64, max_len=64, pooling="cls")
        train_and_export(self._pairs(), tmp_path / "models", cfg=tiny,
                         epochs=1, batch_size=8)
        _write_synthetic_reranker(tmp_path / "models" / "jina-reranker-v1-turbo-en")
        ce = CrossEncoder(tmp_path / "models")
        assert ce.pretrained and ce.name == "jina-reranker-v1-turbo-en"
