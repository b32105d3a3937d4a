"""Property test (SURVEY §4): the tokenizer-only BoT index rows must
activate exactly the same vocab dims as ``encoder.embed(bow=True)``
(modulo the BoT builder's unique-token cap)."""
import numpy as np
import pytest

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.retriever import Retriever, RetrieverConfig

TEXTS = [
    "green tea is a drink",
    "the red planet mars has ice water",
    "einstein wrote the theory of relativity and the famous paper",
    "a",
    "dog dog dog runs runs fast",  # duplicates collapse
]


@pytest.fixture(scope="module")
def retriever():
    tok = make_tokenizer()
    enc = {
        "type": "vdr", "max_len": 32, "topk": 8, "shift_vocab_num": 5,
        **{k: v for k, v in vars(tiny_bert_config(tok.vocab_size)).items()
           if k in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "max_position_embeddings")},
    }
    cfg = RetrieverConfig(encoder_q=dict(enc), encoder_p=dict(enc),
                          shared_encoder=True)
    return Retriever(cfg, tokenizer=tok)


def test_bot_rows_match_bow_embed(retriever):
    ell, cols_np, nnz_np = retriever._build_bot_ell(TEXTS, max_len=32)
    bow = retriever.encoder_p.embed(TEXTS, bow=True, max_len=32)
    assert ell.num_cols == bow.shape[1]
    for i in range(len(TEXTS)):
        bot_dims = set(cols_np[i, : nnz_np[i]].tolist())
        bow_dims = set(np.nonzero(bow[i])[0].tolist())
        assert bot_dims == bow_dims, TEXTS[i]


def test_bot_max_token_cap(retriever):
    ell, cols_np, nnz_np = retriever._build_bot_ell(
        TEXTS, max_len=32, max_token=3)
    assert (nnz_np <= 3).all()
    # the first unique tokens win (encounter order)
    full, fc, fn = retriever._build_bot_ell(TEXTS, max_len=32)
    for i in range(len(TEXTS)):
        assert cols_np[i, : nnz_np[i]].tolist() == \
            fc[i, : min(3, fn[i])].tolist()
