"""VDR encoder tests: reference-semantics parity (vs a torch replication)
and embed-API behavior on a synthetic vocab."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.helpers import make_tokenizer, tiny_bert_config
from vsearch_tpu.models.vdr import VDREncoder, VDREncoderConfig, VDRModule
from vsearch_tpu.models.hf_convert import (
    bert_config_from_hf, convert_vdr_params, torch_state_dict_to_numpy)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def vdr_pair():
    """Tiny torch VDR (replicating reference semantics) + our encoder with
    converted weights."""
    hf_cfg = transformers.BertConfig(
        vocab_size=256, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=96,
        max_position_embeddings=64)
    torch.manual_seed(1)
    bert = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    ln = torch.nn.LayerNorm(48).eval()
    with torch.no_grad():
        ln.weight.uniform_(0.8, 1.2)
        ln.bias.uniform_(-0.1, 0.1)
    shift = 7

    sd = {f"bert_model.{k}": v for k, v in bert.state_dict().items()}
    sd["ln.weight"] = ln.weight
    sd["ln.bias"] = ln.bias

    cfg = VDREncoderConfig(bert=bert_config_from_hf(hf_cfg),
                           shift_vocab_num=shift, max_len=32)
    params = convert_vdr_params(torch_state_dict_to_numpy(sd), cfg.bert)

    def torch_forward(ids, ttype, mask):
        """Reference semantics: BERT -> ln -> @ word_emb[shift:].T ->
        elu1p -> max-pool (src/ir/encoder/vdr.py:58-84)."""
        with torch.no_grad():
            out = bert(input_ids=ids, token_type_ids=ttype,
                       attention_mask=mask).last_hidden_state
            out = ln(out)
            w = bert.embeddings.word_embeddings.weight[shift:, :]
            v = torch.nn.functional.elu(out @ w.t()) + 1
            return v.max(1)[0].numpy()

    return torch_forward, cfg, {"params": params}


def test_vdr_forward_parity_full_length(vdr_pair, rng):
    torch_forward, cfg, variables = vdr_pair
    ids = rng.integers(5, 256, size=(3, 11)).astype(np.int64)
    ttype = np.zeros_like(ids)
    mask = np.ones_like(ids)
    expect = torch_forward(torch.tensor(ids), torch.tensor(ttype),
                           torch.tensor(mask))
    ours = VDRModule(cfg).apply(
        variables, jnp.asarray(ids), jnp.asarray(ttype), jnp.asarray(mask))
    assert ours.shape == (3, 256 - 7)
    np.testing.assert_allclose(np.asarray(ours), expect,
                               rtol=2e-3, atol=1e-3)


def test_vdr_padding_invariance(vdr_pair, rng):
    """Our masked pooling must make embeddings invariant to pad length —
    the intended behavior the reference's unmasked max-pool lacks."""
    _, cfg, variables = vdr_pair
    ids = rng.integers(5, 256, size=(2, 10)).astype(np.int32)
    ttype = np.zeros_like(ids)
    mask = np.ones_like(ids)
    short = VDRModule(cfg).apply(
        variables, jnp.asarray(ids), jnp.asarray(ttype), jnp.asarray(mask))
    ids_pad = np.pad(ids, ((0, 0), (0, 6)))
    long = VDRModule(cfg).apply(
        variables, jnp.asarray(ids_pad), jnp.asarray(np.zeros_like(ids_pad)),
        jnp.asarray((ids_pad != 0).astype(np.int32)))
    np.testing.assert_allclose(np.asarray(short), np.asarray(long),
                               rtol=1e-5, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_encoder():
    tok = make_tokenizer()
    cfg = VDREncoderConfig(
        bert=tiny_bert_config(tok.vocab_size), shift_vocab_num=5,
        max_len=32, topk=8)
    return VDREncoder(cfg, tokenizer=tok)


def test_embed_topk_and_lexical(tiny_encoder):
    texts = ["green tea is a drink", "the red planet mars"]
    emb = tiny_encoder.embed(texts, batch_size=2, topk=8)
    V = tiny_encoder.config.out_dim
    assert emb.shape == (2, V)
    assert (emb >= 0).all()
    # active dims = top-8 plus lexical dims
    nnz = (emb != 0).sum(axis=1)
    assert (nnz >= 8).all()


def test_embed_bow_mode(tiny_encoder):
    texts = ["green tea drink"]
    bow = tiny_encoder.embed(texts, bow=True)
    tok = tiny_encoder.tokenizer
    ids = tok.encode("green tea drink")
    shift = tiny_encoder.config.shift_vocab_num
    expect_dims = {i - shift for i in ids if i >= shift}
    assert set(np.nonzero(bow[0])[0]) == expect_dims
    assert set(np.unique(bow)) <= {0.0, 1.0}


def test_embed_topk_zero_is_lexical_only(tiny_encoder):
    emb = tiny_encoder.embed(["green tea drink"], topk=0)
    bow = tiny_encoder.embed(["green tea drink"], bow=True)
    assert set(np.nonzero(emb[0])[0]) <= set(np.nonzero(bow[0])[0])


def test_embed_batch_consistency(tiny_encoder):
    """Embedding alone or within a batch must give identical vectors
    (static-shape pipeline guarantees this)."""
    solo = tiny_encoder.embed(["the dog runs fast"])
    batch = tiny_encoder.embed(
        ["the dog runs fast", "a cat is small and the city is big near "
         "the river where water runs slow"], batch_size=2)
    np.testing.assert_allclose(solo[0], batch[0], rtol=1e-4, atol=1e-5)


def test_disentangle(tiny_encoder):
    d = tiny_encoder.dst("green tea", topk=10)
    assert isinstance(d, dict) and len(d) > 0
    assert all(v > 0 for v in d.values())
    vals = list(d.values())
    assert vals == sorted(vals, reverse=True)


def test_embed_sparse_matches_dense(tiny_encoder):
    """embed_sparse must reproduce embed()'s nonzero (col, val) pairs."""
    texts = ["green tea is a drink", "the red planet mars"]
    dense = tiny_encoder.embed(texts, topk=8, activate_lexical=False)
    cols, vals = tiny_encoder.embed_sparse(texts, topk=8,
                                           activate_lexical=False)
    for i in range(2):
        got = {int(c): float(v) for c, v in zip(cols[i], vals[i])
               if v > 0}
        expect_nz = np.nonzero(dense[i])[0]
        # topk masking keeps exactly the same support
        assert set(got) == set(int(j) for j in expect_nz)
        for j in expect_nz:
            assert abs(got[int(j)] - dense[i, j]) < 1e-4


def test_embed_sparse_lexical_union(tiny_encoder):
    texts = ["einstein wrote the famous theory"]
    dense = tiny_encoder.embed(texts, topk=4, activate_lexical=True)
    cols, vals = tiny_encoder.embed_sparse(texts, topk=4,
                                           activate_lexical=True)
    got = {int(c) for c, v in zip(cols[0], vals[0]) if v > 0}
    assert got == set(int(j) for j in np.nonzero(dense[0])[0])


def test_vocab_chunked_pooling_matches_small_batch(rng):
    """The large-batch head (b*l >= 8192 -> vocab-chunked scan) must
    produce the same embeddings as the small-batch L-chunked path."""
    tok = make_tokenizer()
    cfg = VDREncoderConfig(bert=tiny_bert_config(tok.vocab_size),
                           shift_vocab_num=5, max_len=64, topk=16)
    module = VDRModule(cfg)
    b, l = 300, 32  # b*l = 9600 >= 8192 -> vocab-chunked
    ids = rng.integers(5, tok.vocab_size, size=(b, l)).astype(np.int32)
    ids[:, -7:] = 0  # ragged padding exercised through the mask
    mask = (ids != 0).astype(np.int32)
    ttype = np.zeros_like(ids)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 8), jnp.int32),
                                     jnp.zeros((1, 8), jnp.int32),
                                     jnp.zeros((1, 8), jnp.int32))
    full = np.asarray(module.apply(variables, jnp.asarray(ids),
                                   jnp.asarray(ttype),
                                   jnp.asarray(mask)))
    # rows 0..15 alone: b*l = 512 -> L-chunked path
    part = np.asarray(module.apply(variables, jnp.asarray(ids[:16]),
                                   jnp.asarray(ttype[:16]),
                                   jnp.asarray(mask[:16])))
    np.testing.assert_allclose(full[:16], part, rtol=2e-5, atol=2e-5)


def test_embed_sparse_clamps_topk_and_rejects_zero():
    """embed_sparse(topk > V') clamps like embed(); an explicit topk=0
    is rejected instead of being silently replaced by config.topk
    (review finding, round 3)."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.models.bert import BertConfig

    tok = make_tokenizer()
    tb = tiny_bert_config(tok.vocab_size)
    cfg = VDREncoderConfig(
        bert=BertConfig(**{k: v for k, v in vars(tb).items()
                           if k in BertConfig.__dataclass_fields__}),
        max_len=16, shift_vocab_num=5, topk=8)
    enc = VDREncoder(cfg, tokenizer=tok)
    cols, vals = enc.embed_sparse(["green tea"], topk=50_000)
    assert cols.shape[1] <= cfg.out_dim + 1
    with pytest.raises(ValueError, match="topk >= 1"):
        enc.embed_sparse(["green tea"], topk=0)


def test_attention_dropout_active_in_training():
    """attention_probs_dropout_prob must actually regularize: two
    training-mode forwards with different rngs differ, deterministic
    forwards match (review finding, round 3 — the fused attention call
    silently dropped the configured prob)."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.models.bert import BertConfig, BertModel

    tok = make_tokenizer()
    tb = tiny_bert_config(tok.vocab_size)
    cfg = BertConfig(**{k: v for k, v in vars(tb).items()
                        if k in BertConfig.__dataclass_fields__})
    assert cfg.attention_probs_dropout_prob > 0
    model = BertModel(cfg)
    ids = jnp.asarray(np.full((2, 8), 7), jnp.int32)
    tt = jnp.zeros_like(ids)
    am = jnp.ones_like(ids)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), ids, tt, am)

    def fwd(rng_seed, det):
        return np.asarray(model.apply(
            variables, ids, tt, am, deterministic=det,
            rngs={"dropout": jax.random.PRNGKey(rng_seed)} if not det
            else None))

    d1, d2 = fwd(1, False), fwd(2, False)
    assert not np.allclose(d1, d2)
    np.testing.assert_allclose(fwd(0, True), fwd(3, True))


def test_encode_mask_with_nonzero_pad_id():
    """The attention mask comes from row lengths, so a tokenizer whose
    pad id is nonzero still masks padding correctly (review finding,
    round 3)."""
    from tests.helpers import make_tokenizer, tiny_bert_config
    from vsearch_tpu.models.bert import BertConfig

    tok = make_tokenizer()
    tok.pad_id = 4  # simulate a vocab where [PAD] is not id 0
    tb = tiny_bert_config(tok.vocab_size)
    cfg = VDREncoderConfig(
        bert=BertConfig(**{k: v for k, v in vars(tb).items()
                           if k in BertConfig.__dataclass_fields__}),
        max_len=32, shift_vocab_num=5, topk=8)
    enc = VDREncoder(cfg, tokenizer=tok)
    out = enc.encode(["green tea", "a much longer sentence about mars"])
    lens = out["attention_mask"].sum(axis=1)
    assert lens[0] < lens[1]  # padding masked off, not attended
    # pad positions hold the pad id, valid positions the real tokens
    assert (out["input_ids"][0, lens[0]:] == 4).all()
