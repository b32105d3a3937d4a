"""Sharded beta-search rerank: mesh vs single-device must agree exactly.

The rerank stage (reference retriever.py:137-147) re-embeds retrieved
candidates; candidates are per-query disjoint, so the embedding runs
data-parallel over the mesh. Retriever.to_mesh shards both the
first-stage index and the rerank; results must match the unsharded path.
"""
import numpy as np
import pytest

import jax

from tests.helpers import make_tokenizer, tiny_bert_config


@pytest.fixture(scope="module")
def retriever_and_corpus():
    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    tok = make_tokenizer()
    vs = tok.vocab_size
    enc = {"type": "vdr", "max_len": 16, "topk": 8, "shift_vocab_num": 5,
           "vocab_size": vs, "hidden_size": 32, "num_hidden_layers": 2,
           "num_attention_heads": 2, "intermediate_size": 64,
           "max_position_embeddings": 64}
    ir = Retriever(RetrieverConfig(encoder_q=dict(enc),
                                   encoder_p=dict(enc),
                                   shared_encoder=True),
                   tokenizer=tok)
    rng = np.random.default_rng(0)
    words = [w for w in tok.vocab
             if not w.startswith("[") and not w.startswith("#")
             and len(w) > 2]
    corpus = [" ".join(rng.choice(words, size=8)) for _ in range(40)]
    return ir, corpus


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_rerank_matches_single_device(retriever_and_corpus):
    from vsearch_tpu.parallel.mesh import make_mesh

    ir, corpus = retriever_and_corpus
    ir.build_index(corpus, index_type="bag_of_token", batch_size=8)
    queries = [corpus[3], corpus[17], corpus[31]]

    base = ir.retrieve(queries, k=5, rerank=True, batch_size=8)
    base_ids, base_scores = np.asarray(base.ids), np.asarray(base.scores)

    ir.to_mesh(make_mesh(dp=8, tp=1))
    sharded = ir.retrieve(queries, k=5, rerank=True, batch_size=8)
    np.testing.assert_array_equal(np.asarray(sharded.ids), base_ids)
    np.testing.assert_allclose(np.asarray(sharded.scores), base_scores,
                               rtol=1e-4, atol=1e-5)
    # each query's own text must rank first
    assert [int(i) for i in base_ids[:, 0]] == [3, 17, 31]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_batch_divisibility_error(retriever_and_corpus):
    from vsearch_tpu.parallel.mesh import make_mesh

    ir, corpus = retriever_and_corpus
    ir.encoder_q.to_mesh(make_mesh(dp=8, tp=1))
    with pytest.raises(ValueError, match="not divisible"):
        ir.encoder_q.embed(corpus[:3], batch_size=3)
    ir.encoder_q._mesh = None  # restore for other tests
