"""Full-size (12x768, vocab 30522) torch<->flax parity for BERT + VDR.

The tiny-dims parity tests (test_bert_parity.py, 2x64) can hide
conversion bugs that only appear at real dims (e.g. head-split layout,
position-embedding length). A random-init full-size
``transformers.BertModel`` needs no network, so this runs offline and
gates the golden-score harness: if this passes, a published checkpoint
can only fail goldens for weight-value reasons, not architecture.

Torch head replicates reference src/ir/encoder/vdr.py:58-84 exactly,
including max-pooling over PAD positions — matched by our
``compat_pad_pooling`` flag.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vsearch_tpu.models.bert import BertModel
from vsearch_tpu.models.hf_convert import (bert_config_from_hf,
                                           convert_bert_params,
                                           convert_vdr_params,
                                           torch_state_dict_to_numpy)
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SHIFT = 999


@pytest.fixture(scope="module")
def full_pair():
    hf_cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=768, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=3072,
        max_position_embeddings=512)
    torch.manual_seed(0)

    class TorchVDR(torch.nn.Module):
        """Reference-shaped VDR (reference vdr.py:47-84)."""

        def __init__(self):
            super().__init__()
            self.bert_model = transformers.BertModel(
                hf_cfg, add_pooling_layer=False)
            self.ln = torch.nn.LayerNorm(hf_cfg.hidden_size)
            with torch.no_grad():
                self.ln.weight.uniform_(0.8, 1.2)
                self.ln.bias.uniform_(-0.05, 0.05)

        def forward(self, ids, ttype, mask):
            h = self.bert_model(input_ids=ids, token_type_ids=ttype,
                                attention_mask=mask).last_hidden_state
            h = self.ln(h)
            w = self.bert_model.embeddings.word_embeddings.weight[SHIFT:]
            v = torch.nn.functional.elu(h @ w.t()) + 1
            return v.max(1)[0]  # reference pools PAD positions too

    tmodel = TorchVDR().eval()
    return hf_cfg, tmodel


@pytest.fixture(scope="module")
def inputs(rng_module):
    b, l = 3, 48
    ids = rng_module.integers(1000, 30522, size=(b, l)).astype(np.int64)
    mask = np.ones_like(ids)
    # ragged padding: rows 0 and 2 padded
    ids[0, 30:] = 0
    mask[0, 30:] = 0
    ids[2, 40:] = 0
    mask[2, 40:] = 0
    ttype = np.zeros_like(ids)
    return ids, ttype, mask


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(7)


def test_bert_fulldims_hidden_parity(full_pair, inputs):
    hf_cfg, tmodel = full_pair
    ids, ttype, mask = inputs
    with torch.no_grad():
        expect = tmodel.bert_model(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.tensor(ttype),
            attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
    cfg = bert_config_from_hf(hf_cfg)
    params = convert_bert_params(
        torch_state_dict_to_numpy(tmodel.bert_model.state_dict()), cfg)
    ours = np.asarray(BertModel(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(ttype),
        jnp.asarray(mask)))
    # PAD positions included: HF computes them identically (pad queries
    # attend to valid keys) and the compat pooling consumes them.
    np.testing.assert_allclose(ours, expect, rtol=5e-3, atol=5e-3)


def test_vdr_fulldims_compat_pooling_parity(full_pair, inputs):
    hf_cfg, tmodel = full_pair
    ids, ttype, mask = inputs
    with torch.no_grad():
        expect = tmodel(torch.tensor(ids), torch.tensor(ttype),
                        torch.tensor(mask)).numpy()
    cfg = VDREncoderConfig(
        bert=bert_config_from_hf(hf_cfg), shift_vocab_num=SHIFT,
        max_len=64, compat_pad_pooling=True)
    params = convert_vdr_params(
        torch_state_dict_to_numpy(tmodel.state_dict()), cfg.bert)
    ours = np.asarray(VDRModule(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(ttype),
        jnp.asarray(mask)))
    assert ours.shape == (3, 30522 - SHIFT)
    np.testing.assert_allclose(ours, expect, rtol=5e-3, atol=5e-3)
    # golden-style score parity: q @ p.T on the same embeddings
    scores = ours @ ours.T
    expect_scores = expect @ expect.T
    np.testing.assert_allclose(scores, expect_scores, rtol=1e-3)


def test_vdr_fulldims_default_pooling_differs_on_pads(full_pair, inputs):
    """The padding-invariant default must differ from compat pooling on a
    padded batch (guards against the flag silently doing nothing)."""
    hf_cfg, tmodel = full_pair
    ids, ttype, mask = inputs
    params = convert_vdr_params(
        torch_state_dict_to_numpy(tmodel.state_dict()),
        bert_config_from_hf(hf_cfg))
    outs = {}
    for compat in (False, True):
        cfg = VDREncoderConfig(
            bert=bert_config_from_hf(hf_cfg), shift_vocab_num=SHIFT,
            max_len=64, compat_pad_pooling=compat)
        outs[compat] = np.asarray(VDRModule(cfg).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(ttype),
            jnp.asarray(mask)))
    # padded rows differ; the unpadded row (1) is identical
    assert not np.allclose(outs[False][0], outs[True][0], atol=1e-5)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-6, atol=1e-6)
