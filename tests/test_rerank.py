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
        # single candidate: rrf normalizes to 1.0
        assert out[0].final_score == pytest.approx(
            0.575 * out[0].rerank_score + 0.425, abs=1e-6
        )

    def test_empty(self):
        r = NeuralReranker()
        assert r.rerank("q", []) == []
        assert r.rerank_and_blend("q", [], {}) == []
