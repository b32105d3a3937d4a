"""Metric math tests (hand-checked values) + bi-encoder BEIR-style eval."""
import numpy as np
import pytest

from vsearch_tpu.eval.retrieval_eval import (dcg_at_k, evaluate_biencoder,
                                             evaluate_rankings, ndcg_at_k)


def test_dcg_known_values():
    assert dcg_at_k([1, 0, 0], 3) == pytest.approx(1.0)
    assert dcg_at_k([0, 1], 2) == pytest.approx(1 / np.log2(3))
    assert dcg_at_k([3, 2, 3], 3) == pytest.approx(
        3 + 2 / np.log2(3) + 3 / np.log2(4))


def test_ndcg_perfect_is_one():
    assert ndcg_at_k([3, 2, 1], [3, 2, 1], 3) == pytest.approx(1.0)
    assert ndcg_at_k([1, 2, 3], [3, 2, 1], 3) < 1.0


def test_evaluate_rankings():
    run = {"q1": ["d1", "d2", "d3"], "q2": ["d3", "d1", "d2"]}
    qrels = {"q1": {"d1": 1.0}, "q2": {"d2": 1.0}}
    m = evaluate_rankings(run, qrels, ks=(1, 3))
    assert m["recall@1"] == pytest.approx(0.5)   # q1 hit, q2 miss
    assert m["recall@3"] == pytest.approx(1.0)
    assert m["mrr@3"] == pytest.approx((1.0 + 1 / 3) / 2)
    assert 0 < m["ndcg@3"] <= 1.0


def test_evaluate_biencoder_end_to_end():
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.biencoder import BiEncoder, BiEncoderConfig

    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 24, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    model = BiEncoder(BiEncoderConfig(encoder_q=dict(enc),
                                      encoder_p=dict(enc),
                                      shared_encoder=True),
                      tokenizer=tok)
    queries = {"q1": "green tea drink"}
    corpus = {"d1": {"title": "", "text": "green tea is a drink"},
              "d2": {"title": "", "text": "the red planet mars"}}
    qrels = {"q1": {"d1": 1.0}}
    m = evaluate_biencoder(model, queries, corpus, qrels, k=2,
                           ks=(1, 2))
    assert set(m) == {"ndcg@1", "ndcg@2", "recall@1", "recall@2",
                      "mrr@1", "mrr@2"}
    assert all(0.0 <= v <= 1.0 for v in m.values())
