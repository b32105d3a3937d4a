"""Torch-replication parity for the loss stack and VDR pooling variants.

Replicates the reference's exact torch math at tiny dims and asserts our
jax implementations produce the same numbers:
  * 4-term semi-parametric InfoNCE incl. the ``cts_mask`` vocab-slot
    regularizer (reference src/ir/training/loss_utils.py:175-198) and
    both nll losses (loss_utils.py:302-388)
  * mean / pooling_topk sequence pooling (reference
    src/ir/encoder/vdr.py:76-82, with the intended fix for the
    reference's undefined-variable mean bug)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vsearch_tpu.train.loss import VDRLossConfig, compute_vdr_loss

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ---- reference replicas (torch) -----------------------------------------

def ref_build_topk_mask(embs, topk):
    mask = torch.zeros_like(embs, dtype=torch.bool)
    _, idx = embs.topk(topk, dim=-1)
    return mask.scatter_(-1, idx, True)


def ref_init_cts_mask_like(embs):  # reference sparse.py:32-36
    batch_size, vocab_size = embs.size()
    indices = torch.arange(vocab_size) % batch_size
    return indices.unsqueeze(0) == torch.arange(batch_size).unsqueeze(1)


def ref_build_cts_mask(bow_embs):  # reference sparse.py:39-43
    bow_batch = bow_embs.sum(0).bool()
    return ref_init_cts_mask_like(bow_embs) & ~bow_batch.unsqueeze(0)


def ref_nll(q, p):  # reference loss_utils.py:302-341
    n = q.shape[0]
    scores = q @ p.t()
    logp = F.log_softmax(scores, dim=1)
    tgt = torch.arange(n)
    loss = F.nll_loss(logp, tgt, reduction="mean")
    correct = (logp.max(1).indices == tgt).sum()
    return loss, correct


def ref_sym_nll(q, p, temperature=1.0, scaled_loss=False):
    # reference loss_utils.py:343-388
    n = q.shape[0]
    scores = q @ p.t()
    scores_t = scores.t()[list(range(n)), :]
    logits_q = F.log_softmax(scores / temperature, dim=1)
    tgt = torch.arange(n)
    loss1 = F.nll_loss(logits_q, tgt, reduction="mean")
    correct = (logits_q.max(1).indices == tgt).sum()
    logits_p = F.log_softmax(scores_t / temperature, dim=1)
    loss2 = F.nll_loss(logits_p, tgt, reduction="mean")
    loss = loss1 + (loss1 / loss2).detach() * loss2 if scaled_loss \
        else loss1 + loss2
    return loss, correct


def ref_compute_vdr_loss(q_emb, p_emb, q_bin, p_bin, cfg: VDRLossConfig):
    """reference loss_utils.py:109-207, single-process (world=1)."""
    n = q_emb.shape[0]
    loss_func = (lambda q, p: ref_sym_nll(q, p, cfg.temperature,
                                          cfg.scaled_loss)) \
        if cfg.sym_loss else ref_nll
    # fetch_global_vectors sparsification (loss_utils.py:16-19)
    q_topk = q_emb * (ref_build_topk_mask(q_emb, cfg.topk) | (q_bin > 0))
    p_topk = p_emb * (ref_build_topk_mask(p_emb, cfg.topk) | (p_bin > 0))
    if not cfg.semi:
        l1, c1 = loss_func(q_topk, p_emb)
        l2, c2 = loss_func(q_bin, p_emb)
        return (l1 + l2) / 2, (c1, c2)
    l1, c1 = loss_func(q_topk, p_emb)
    l2, c2 = loss_func(q_emb, p_topk)
    if cfg.cts_mask:
        q_bin, p_bin, q_emb, p_emb = (t.clone() for t in
                                      (q_bin, p_bin, q_emb, p_emb))
        act = ref_build_cts_mask(q_bin)
        deact = torch.ones_like(p_emb)
        deact[:n] = ~act
        actn = F.normalize(act.float()) if cfg.cts_mask_norm \
            else act.float()
        q_bin = q_bin + actn * cfg.cts_mask_weight
        p_emb = p_emb * deact
        act = ref_build_cts_mask(p_bin)
        deact = ~act[:n]
        actn = F.normalize(act.float()) if cfg.cts_mask_norm \
            else act.float()
        p_bin = p_bin + actn * cfg.cts_mask_weight
        q_emb = q_emb * deact
    l3, c3 = loss_func(q_bin, p_emb)
    l4, c4 = loss_func(q_emb, p_bin)
    return (l1 + l2 + l3 + l4) / 4, ((c1 + c2) / 2, (c3 + c4) / 2)


# ---- fixtures -------------------------------------------------------------

N, NEGS, V, TOPK = 6, 2, 64, 12


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    q_emb = np.abs(rng.normal(size=(N, V))).astype(np.float32)
    p_emb = np.abs(rng.normal(size=(N * (1 + NEGS), V))).astype(np.float32)
    q_bin = (rng.random((N, V)) < 0.15).astype(np.float32)
    p_bin = (rng.random((N * (1 + NEGS), V)) < 0.15).astype(np.float32)
    return q_emb, p_emb, q_bin, p_bin


CONFIGS = [
    VDRLossConfig(topk=TOPK, cts_mask=True),
    VDRLossConfig(topk=TOPK, cts_mask=True, cts_mask_norm=True,
                  cts_mask_weight=0.5),
    VDRLossConfig(topk=TOPK, cts_mask=True, sym_loss=False),
    VDRLossConfig(topk=TOPK, cts_mask=True, scaled_loss=True,
                  temperature=0.5),
    VDRLossConfig(topk=TOPK, cts_mask=False),
    VDRLossConfig(topk=TOPK, semi=False),
]


@pytest.mark.parametrize("cfg", CONFIGS,
                         ids=lambda c: (f"sym{int(c.sym_loss)}_semi"
                                        f"{int(c.semi)}_cts{int(c.cts_mask)}"
                                        f"_n{int(c.cts_mask_norm)}"
                                        f"_s{int(c.scaled_loss)}"))
def test_vdr_loss_matches_reference_torch(batch, cfg):
    q_emb, p_emb, q_bin, p_bin = batch
    expect, _ = ref_compute_vdr_loss(
        torch.tensor(q_emb), torch.tensor(p_emb), torch.tensor(q_bin),
        torch.tensor(p_bin), cfg)
    ours, metrics = compute_vdr_loss(
        jnp.asarray(q_emb), jnp.asarray(p_emb), jnp.asarray(q_bin),
        jnp.asarray(p_bin), cfg)
    np.testing.assert_allclose(float(ours), float(expect), rtol=1e-5,
                               atol=1e-6)


def test_cts_mask_op_matches_reference(batch):
    from vsearch_tpu.ops.sparse import build_cts_mask

    _, _, q_bin, _ = batch
    expect = ref_build_cts_mask(torch.tensor(q_bin)).numpy()
    ours = np.asarray(build_cts_mask(jnp.asarray(q_bin)))
    np.testing.assert_array_equal(ours.astype(bool), expect)


# ---- pooling variants ------------------------------------------------------

def test_mean_and_topk_pooling_match_torch():
    from tests.helpers import tiny_bert_config
    from vsearch_tpu.models.hf_convert import (convert_vdr_params,
                                               torch_state_dict_to_numpy)
    from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule

    transformers = pytest.importorskip("transformers")
    vs, shift = 96, 7
    hf_cfg = transformers.BertConfig(
        vocab_size=vs, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=32)
    torch.manual_seed(0)

    class TorchVDR(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.bert_model = transformers.BertModel(
                hf_cfg, add_pooling_layer=False)
            self.ln = torch.nn.LayerNorm(32)

        def forward(self, ids, ttype, mask, pooling_topk):
            h = self.ln(self.bert_model(
                input_ids=ids, token_type_ids=ttype,
                attention_mask=mask).last_hidden_state)
            w = self.bert_model.embeddings.word_embeddings.weight[shift:]
            v = F.elu(h @ w.t()) + 1
            if pooling_topk:  # reference vdr.py:78-79
                return v.topk(pooling_topk, dim=1).values.mean(1)
            return v.mean(1)  # reference's intended (bugfixed) mean

    tmodel = TorchVDR().eval()
    rng = np.random.default_rng(0)
    ids = rng.integers(shift, vs, size=(3, 12)).astype(np.int64)
    ids[0, 8:] = 0
    mask = np.ones_like(ids)
    mask[0, 8:] = 0
    ttype = np.zeros_like(ids)
    params = convert_vdr_params(
        torch_state_dict_to_numpy(tmodel.state_dict()),
        tiny_bert_config(vs))
    bcfg = tiny_bert_config(vs)
    import dataclasses
    bcfg = dataclasses.replace(bcfg, hidden_size=32,
                               num_attention_heads=2, intermediate_size=64,
                               max_position_embeddings=32)
    for ptk in (0, 4):
        with torch.no_grad():
            expect = tmodel(torch.tensor(ids), torch.tensor(ttype),
                            torch.tensor(mask), ptk).numpy()
        cfg = VDREncoderConfig(bert=bcfg, shift_vocab_num=shift,
                               pooling="mean", pooling_topk=ptk,
                               compat_pad_pooling=True)
        ours = np.asarray(VDRModule(cfg).apply(
            {"params": params}, jnp.asarray(ids), jnp.asarray(ttype),
            jnp.asarray(mask)))
        np.testing.assert_allclose(ours, expect, rtol=2e-3, atol=1e-3)
