"""Parity of our flax BERT vs HF torch BertModel on identical weights.

The reference delegates its backbone to HF torch BERT; we verify our
TPU-native re-implementation is numerically equivalent (same weights, same
inputs -> same hidden states) using a locally-initialized tiny torch model.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vsearch_tpu.models.bert import BertConfig, BertModel
from vsearch_tpu.models.hf_convert import (
    bert_config_from_hf,
    convert_bert_params,
    torch_state_dict_to_numpy,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    hf_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64)
    torch.manual_seed(0)
    tmodel = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = bert_config_from_hf(hf_cfg)
    params = convert_bert_params(
        torch_state_dict_to_numpy(tmodel.state_dict()), cfg)
    return tmodel, cfg, {"params": params}


def test_forward_parity_no_padding(tiny_pair, rng):
    tmodel, cfg, variables = tiny_pair
    ids = rng.integers(0, 512, size=(3, 12)).astype(np.int64)
    attn = np.ones_like(ids)
    ttype = np.zeros_like(ids)
    with torch.no_grad():
        torch_out = tmodel(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.tensor(ttype),
            attention_mask=torch.tensor(attn),
        ).last_hidden_state.numpy()
    ours = BertModel(cfg).apply(
        variables, jnp.asarray(ids), jnp.asarray(ttype), jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(ours), torch_out,
                               rtol=2e-3, atol=1e-3)


def test_forward_parity_with_padding(tiny_pair, rng):
    tmodel, cfg, variables = tiny_pair
    ids = rng.integers(1, 512, size=(2, 16)).astype(np.int64)
    attn = np.ones_like(ids)
    ids[0, 10:] = 0
    attn[0, 10:] = 0
    ttype = np.zeros_like(ids)
    with torch.no_grad():
        torch_out = tmodel(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.tensor(ttype),
            attention_mask=torch.tensor(attn),
        ).last_hidden_state.numpy()
    ours = np.asarray(BertModel(cfg).apply(
        variables, jnp.asarray(ids), jnp.asarray(ttype), jnp.asarray(attn)))
    # compare only non-pad positions (pad outputs are unconstrained)
    np.testing.assert_allclose(ours[0, :10], torch_out[0, :10],
                               rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(ours[1], torch_out[1], rtol=2e-3, atol=1e-3)
