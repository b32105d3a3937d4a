"""End-to-end Retriever tests on a tiny model + synthetic vocab:
build/search all three index types, beta-search rerank, save/load,
negative mining, explain."""
import numpy as np
import pytest

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.biencoder import BiEncoderConfig
from vsearch_tpu.index import IndexType
from vsearch_tpu.retriever import Retriever, RetrieverConfig

CORPUS = [
    "green tea is a drink",
    "the red planet mars has ice water on the surface",
    "einstein wrote the famous theory of relativity",
    "a big dog runs fast in the city",
    "the river water runs slow and is small",
    "physics is the theory of space and time and light",
]


@pytest.fixture(scope="module")
def retriever():
    tok = make_tokenizer()
    enc_cfg = {
        "type": "vdr",
        "max_len": 32,
        "topk": 16,
        "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc_cfg),
                          encoder_p=dict(enc_cfg), shared_encoder=True)
    return Retriever(cfg, tokenizer=tok)


@pytest.mark.parametrize("index_type", ["dense", "sparse", "bag_of_token"])
def test_build_and_retrieve(retriever, index_type):
    retriever.build_index(CORPUS, batch_size=4, index_type=index_type)
    res = retriever.retrieve(["green tea drink", "theory of relativity"],
                             k=3)
    assert np.asarray(res.ids).shape == (2, 3)
    assert np.asarray(res.scores).shape == (2, 3)
    # scores sorted descending
    s = np.asarray(res.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()


def test_sparse_matches_dense_embeddings(retriever):
    """Sparse(ELL) index over the same embeddings must rank identically
    to the dense index."""
    dense_idx = retriever.build_index(CORPUS, batch_size=4,
                                      index_type="dense")
    dres = retriever.retrieve(["einstein physics paper"], k=4)
    retriever.build_index(CORPUS, batch_size=4, index_type="sparse")
    sres = retriever.retrieve(["einstein physics paper"], k=4)
    np.testing.assert_array_equal(np.asarray(dres.ids),
                                  np.asarray(sres.ids))
    np.testing.assert_allclose(np.asarray(dres.scores),
                               np.asarray(sres.scores), rtol=2e-2,
                               atol=2e-2)


def test_bot_index_lexical_overlap(retriever):
    """BoT score == sum of query weights on passage tokens: a query
    repeating a passage's exact words should hit that passage."""
    retriever.build_index(CORPUS, batch_size=4,
                          index_type="bag_of_token")
    res = retriever.retrieve(["relativity einstein theory famous"], k=2)
    assert 2 in np.asarray(res.ids)[0]


def test_beta_search_rerank(retriever):
    retriever.build_index(CORPUS, batch_size=4,
                          index_type="bag_of_token")
    plain = retriever.retrieve(["the famous theory of relativity"], k=4,
                               rerank=False)
    reranked = retriever.retrieve(["the famous theory of relativity"], k=4,
                                  rerank=True)
    # rerank returns a permutation of the first-stage candidates
    assert set(np.asarray(reranked.ids)[0]) == set(np.asarray(plain.ids)[0])
    s = np.asarray(reranked.scores)
    assert (np.diff(s, axis=1) <= 1e-5).all()


def test_index_save_load_roundtrip(retriever, tmp_path):
    retriever.build_index(CORPUS, batch_size=4, index_type="sparse")
    before = retriever.retrieve(["green tea"], k=3)
    path = str(tmp_path / "idx.npz")
    retriever.save_index(path)
    retriever.load_index(index_file=path)
    retriever.index.data = list(CORPUS)
    after = retriever.retrieve(["green tea"], k=3)
    np.testing.assert_array_equal(np.asarray(before.ids),
                                  np.asarray(after.ids))


def test_bot_save_load_scipy_compat(retriever, tmp_path):
    retriever.build_index(CORPUS, batch_size=4,
                          index_type="bag_of_token")
    before = retriever.retrieve(["mars ice water"], k=3)
    path = str(tmp_path / "idx.bot.npz")
    retriever.save_index(path)
    retriever.load_index(index_file=path)  # inferred BAG_OF_TOKEN
    assert retriever.index.index_type == IndexType.BAG_OF_TOKEN
    retriever.index.data = list(CORPUS)
    after = retriever.retrieve(["mars ice water"], k=3)
    np.testing.assert_array_equal(np.asarray(before.ids),
                                  np.asarray(after.ids))


def test_retrieve_negatives(retriever):
    retriever.build_index(CORPUS, batch_size=4, index_type="dense")
    q_emb = retriever.process_query(["who wrote the theory of relativity"])
    negs = retriever.retrieve_negatives(
        q_emb, answers=[["einstein"]], ret_neg_num=2, ret_topk=6,
        pool_size=4, seed=0)
    assert len(negs) == 1 and len(negs[0]) == 2
    for text in negs[0]:
        assert "einstein" not in text.lower()
    # misspelled reference alias still works
    negs2 = retriever.retireve_negatives(
        q_emb, answers=[["einstein"]], ret_neg_num=1, seed=0)
    assert len(negs2[0]) == 1


def test_explain(retriever):
    d = retriever.explain("green tea", "green tea is a drink", topk=20)
    assert isinstance(d, dict) and len(d) > 0
    vals = list(d.values())
    assert vals == sorted(vals, reverse=True)


def test_save_load_pretrained(retriever, tmp_path):
    path = str(tmp_path / "ckpt")
    retriever.save_pretrained(path)
    loaded = Retriever.from_pretrained(path,
                                       tokenizer=retriever.tokenizer
                                       if hasattr(retriever, "tokenizer")
                                       else retriever.encoder_q.tokenizer)
    e1 = retriever.encoder_q.embed(["green tea"])
    e2 = loaded.encoder_q.embed(["green tea"])
    np.testing.assert_allclose(e1, e2, rtol=1e-5, atol=1e-6)


def test_beta_rerank_with_k_exceeding_corpus(retriever):
    """k larger than the corpus: the index clamps it, and the rerank
    stage must follow the clamped width (regression: reshape crash when
    the CLI asked num_rerank=100 over a tiny index)."""
    retriever.build_index(CORPUS, batch_size=4,
                          index_type="bag_of_token")
    res = retriever.retrieve(["green tea drink"], k=100, rerank=True)
    ids = np.asarray(res.ids)
    assert ids.shape == (1, len(CORPUS))
    assert sorted(ids[0].tolist()) == list(range(len(CORPUS)))


def test_biencoder_forward_reference_surface(rng):
    """Reference-compat forward (biencoder.py:61-73): token tensors ->
    (q_emb, p_emb) raw embeddings, matching each encoder's module."""
    import jax.numpy as jnp

    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 24, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    r = Retriever(RetrieverConfig(encoder_q=dict(enc),
                                  encoder_p=dict(enc),
                                  shared_encoder=True), tokenizer=tok)
    ids = rng.integers(5, tok.vocab_size, size=(2, 10)).astype(np.int32)
    seg = np.zeros_like(ids)
    mask = np.ones_like(ids)
    q_emb, p_emb = r.forward(ids, seg, mask, ids, seg, mask)
    assert q_emb.shape == p_emb.shape == (2, tok.vocab_size - 5)
    direct = r.encoder_q.module.apply(
        r.encoder_q.variables, jnp.asarray(ids), jnp.asarray(seg),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(q_emb), np.asarray(direct),
                               rtol=1e-6)
    # callable like the reference's nn.Module
    q2, _ = r(ids, seg, mask, ids, seg, mask)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q_emb))


def test_beta_rerank_dedup_and_sort_invariance(rng):
    """Rerank with cross-query dedup + length-sorted embed batches must
    return exactly what per-slot embedding would: overlapping candidate
    sets across queries, strongly varied text lengths."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.index import SearchResults
    from vsearch_tpu.retriever import Retriever, RetrieverConfig

    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 16, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    r = Retriever(RetrieverConfig(encoder_q=dict(enc),
                                  encoder_p=dict(enc),
                                  shared_encoder=True), tokenizer=tok)
    words = ["tea", "mars", "city", "river", "light", "dog"]
    corpus = [" ".join(rng.choice(words, size=int(n)))
              for n in rng.integers(2, 28, size=12)]
    r.build_index(corpus, batch_size=4, index_type="bag_of_token")

    queries = ["green tea drink", "river water", "dog city"]
    q_emb = r.process_query(queries)
    # heavy overlap: every query shares candidates 0..3
    ids = np.array([[0, 1, 2, 3, 4], [0, 1, 2, 3, 5],
                    [0, 1, 2, 3, 6]])
    first = SearchResults(ids, np.zeros_like(ids, dtype=np.float32))
    out = r._beta_rerank(q_emb, first, r.index, k=5, batch_size=4)

    # brute force: embed each candidate alone, score, sort
    for qi in range(3):
        embs = np.stack([r.encoder_p.embed([corpus[j]])[0]
                         for j in ids[qi]])
        scores = embs @ np.asarray(q_emb[qi], dtype=np.float32)
        expect = ids[qi][np.argsort(-scores, kind="stable")]
        np.testing.assert_array_equal(np.asarray(out.ids)[qi], expect)
        np.testing.assert_allclose(
            np.asarray(out.scores)[qi],
            np.sort(scores)[::-1], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("index_type", ["dense", "sparse", "bag_of_token"])
def test_build_index_accepts_dict_corpus(retriever, index_type):
    """Dict corpora ({'title','text'}) must build on EVERY index type
    with the encode_corpus title-joining — the fused sparse path and
    the tokenizer-only BoT path previously crashed on dicts (probe
    finding, round 3; reference biencoder.py:88-109)."""
    corpus = [{"text": t, "title": f"t{i}" if i % 2 else ""}
              for i, t in enumerate(CORPUS)]
    retriever.build_index(corpus, index_type=index_type, batch_size=4)
    res = retriever.retrieve(["who wrote the theory of relativity"],
                             k=2, rerank=(index_type == "bag_of_token"))
    ids = np.asarray(res.ids)
    assert ids.shape == (1, 2)
    assert (ids < len(CORPUS)).all()
    # index.data keeps the ORIGINAL dicts for get_sample
    assert isinstance(retriever.index.get_sample(int(ids[0, 0])), dict)


def test_retrieve_negatives_from_string_queries(retriever):
    """Negative mining accepts raw query strings (not only
    embeddings): the unconditional np.asarray wrap previously turned
    them into an np.str_ array that crashed process_query (probe
    finding, round 3)."""
    retriever.build_index(CORPUS, index_type="bag_of_token",
                          batch_size=4)
    negs = retriever.retrieve_negatives(
        ["who wrote the theory of relativity"], [["einstein"]],
        ret_neg_num=2, seed=0)
    assert len(negs) == 1 and len(negs[0]) == 2
    assert all("einstein" not in t for t in negs[0])
    # embeddings keep working
    emb = retriever.encoder_q.embed(["who wrote relativity"])
    negs2 = retriever.retrieve_negatives(emb, [["einstein"]],
                                         ret_neg_num=1, seed=0)
    assert len(negs2[0]) == 1


def test_embed_topk_clamped_to_out_dim(retriever):
    """embed(topk > V') clamps instead of crashing lax.top_k — the
    reference default a=768 exceeds small output dims (probe finding,
    round 3)."""
    out = retriever.encoder_q.embed(["green tea"], topk=10_000)
    assert out.shape[1] == retriever.encoder_q.config.out_dim
    # oversized and exact-dim requests share one compiled fn
    n_before = len(retriever.encoder_q._fn_cache)
    retriever.encoder_q.embed(["green tea"],
                              topk=retriever.encoder_q.config.out_dim)
    assert len(retriever.encoder_q._fn_cache) == n_before


def test_dpr_retrieve_with_string_queries():
    """DPR configs have no .topk; retrieve() with string queries must
    not crash on it (review finding, round 3 — broke the whole dense
    DPR search/serve path)."""
    from tests.helpers import make_tokenizer, tiny_bert_config

    tok = make_tokenizer()
    enc = {
        "type": "dpr", "max_len": 32,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    r = Retriever(cfg, tokenizer=tok)
    r.build_index(CORPUS, index_type="dense", batch_size=4)
    res = r.retrieve(["who wrote the theory of relativity"], k=2)
    assert np.asarray(res.ids).shape == (1, 2)


def test_beta_rerank_embeds_title_joined_text():
    """The rerank stage must re-embed the SAME string the index was
    built from — 'title [SEP] text' for dict corpora (review finding,
    round 3)."""
    from vsearch_tpu.retriever import _passage_embed_text

    assert _passage_embed_text(
        {"text": "body", "title": "head"}) == "head [SEP] body"
    assert _passage_embed_text({"text": "body", "title": ""}) == "body"
    assert _passage_embed_text({"contents": "body"}) == "body"
    assert _passage_embed_text("plain") == "plain"


def test_retrieve_negatives_seed_covers_dropout(retriever):
    """With ret_dropout > 0 the seed must make mining reproducible —
    the dropout rng previously fell back to OS entropy (review
    finding, round 3)."""
    retriever.build_index(CORPUS, index_type="bag_of_token",
                          batch_size=4)
    kw = dict(answers=[["einstein"]], ret_neg_num=2, ret_dropout=0.3,
              seed=7)
    n1 = retriever.retrieve_negatives(["who wrote relativity"], **kw)
    n2 = retriever.retrieve_negatives(["who wrote relativity"], **kw)
    assert n1 == n2


def test_save_pretrained_preserves_vocab_id_gaps(tmp_path):
    """vocab.txt must be written by line position with gaps kept as
    blank lines — compaction renumbered every token after a gap on
    reload (review finding, round 3)."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.tokenization.wordpiece import load_vocab

    tok = make_tokenizer()
    last = max(tok.vocab, key=tok.vocab.get)
    tok.vocab[last] = tok.vocab[last] + 2  # open a gap
    enc = {
        "type": "vdr", "max_len": 16, "topk": 8, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(
            max(tok.vocab.values()) + 1)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    r = Retriever(cfg, tokenizer=tok)
    r.save_pretrained(str(tmp_path / "ckpt"))
    reloaded = load_vocab(str(tmp_path / "ckpt" / "vocab.txt"))
    assert reloaded == tok.vocab


def test_beta_rerank_over_block_tier(retriever):
    """The wiki21m-scale user path: BoT first stage on the BLOCK tier
    (>HBM oversize) + parametric rerank; ranking must match the same
    flow over the resident index."""
    retriever.build_index(CORPUS, batch_size=4,
                          index_type="bag_of_token")
    res_resident = retriever.retrieve(["theory of relativity physics"],
                                      k=3, rerank=True)
    idx = retriever.index
    cols = np.asarray(idx.ell.cols)
    nnz = np.asarray(idx.ell.nnz)
    from vsearch_tpu.index import BoTIndex
    from vsearch_tpu.ops.ell import ELLMatrix

    blk = BoTIndex(search_mode="block")
    blk.stream_block_rows = 64
    blk.set_ell(ELLMatrix(cols=cols, nnz=nnz, vals=None,
                          num_cols=idx.ell.num_cols,
                          sentinel_padded=idx.ell.sentinel_padded),
                host_cache=(cols, nnz))
    blk.data = idx.data  # rerank needs the passage texts
    retriever.index = blk
    try:
        res_block = retriever.retrieve(["theory of relativity physics"],
                                       k=3, rerank=True)
    finally:
        retriever.index = idx
    np.testing.assert_array_equal(np.asarray(res_block.ids),
                                  np.asarray(res_resident.ids))
    np.testing.assert_allclose(np.asarray(res_block.scores),
                               np.asarray(res_resident.scores),
                               rtol=2e-2, atol=2e-2)
