"""Loss-function tests: torch-replication parity for the InfoNCE family
and structural properties of the 4-term semi-parametric loss."""
import numpy as np
import pytest

import jax.numpy as jnp

from vsearch_tpu.train.loss import (
    VDRLossConfig,
    biencoder_nll_loss,
    compute_dpr_loss,
    compute_vdr_loss,
    symmetry_biencoder_nll_loss,
)

torch = pytest.importorskip("torch")


def torch_nll(q, p):
    """Independent torch replication of reference loss_utils.py:302-340."""
    import torch.nn.functional as F

    scores = torch.tensor(q) @ torch.tensor(p).t()
    logp = F.log_softmax(scores, dim=1)
    tgt = torch.arange(q.shape[0])
    return F.nll_loss(logp, tgt, reduction="mean").item(), (
        logp.argmax(1) == tgt).sum().item()


def torch_sym_nll(q, p, temperature=1.0, scaled=False):
    """Replication of reference loss_utils.py:343-388."""
    import torch.nn.functional as F

    qt, pt = torch.tensor(q), torch.tensor(p)
    n = qt.shape[0]
    scores = qt @ pt.t()
    scores_t = scores.t()[list(range(n)), :]
    tgt = torch.arange(n)
    l1 = F.nll_loss(F.log_softmax(scores / temperature, 1), tgt)
    l2 = F.nll_loss(F.log_softmax(scores_t / temperature, 1), tgt)
    if scaled:
        loss = l1 + (l1 / l2).detach() * l2
    else:
        loss = l1 + l2
    correct = (F.log_softmax(scores / temperature, 1).argmax(1)
               == tgt).sum().item()
    return loss.item(), correct


@pytest.fixture
def qp(rng):
    q = rng.normal(size=(6, 40)).astype(np.float32)
    p = rng.normal(size=(12, 40)).astype(np.float32)
    # make diagonal positives win sometimes
    p[:6] += 0.5 * q
    return q, p


def test_nll_parity(qp):
    q, p = qp
    loss, correct = biencoder_nll_loss(jnp.asarray(q), jnp.asarray(p))
    tloss, tcorrect = torch_nll(q, p)
    np.testing.assert_allclose(float(loss), tloss, rtol=1e-5)
    assert int(correct) == tcorrect


@pytest.mark.parametrize("scaled", [False, True])
def test_sym_nll_parity(qp, scaled):
    q, p = qp
    loss, correct = symmetry_biencoder_nll_loss(
        jnp.asarray(q), jnp.asarray(p), temperature=1.0,
        scaled_loss=scaled)
    tloss, tcorrect = torch_sym_nll(q, p, scaled=scaled)
    np.testing.assert_allclose(float(loss), tloss, rtol=1e-5)
    assert int(correct) == tcorrect


def _random_bin(rng, shape, density=0.1):
    return (rng.random(shape) < density).astype(np.float32)


def test_vdr_loss_4term_average(qp, rng):
    """semi=True loss equals the mean of the four pairwise losses."""
    q, p = qp
    q = np.abs(q)  # vocab embeddings are nonnegative
    p = np.abs(p)
    q_bin = _random_bin(rng, q.shape)
    p_bin = _random_bin(rng, p.shape)
    cfg = VDRLossConfig(semi=True, sym_loss=False, topk=8)
    loss, metrics = compute_vdr_loss(jnp.asarray(q), jnp.asarray(p),
                                     jnp.asarray(q_bin),
                                     jnp.asarray(p_bin), cfg)
    from vsearch_tpu.train.loss import sparsify_with_lexical
    qt = np.asarray(sparsify_with_lexical(jnp.asarray(q),
                                          jnp.asarray(q_bin), 8))
    pt = np.asarray(sparsify_with_lexical(jnp.asarray(p),
                                          jnp.asarray(p_bin), 8))
    expected = np.mean([torch_nll(qt, p)[0], torch_nll(q, pt)[0],
                        torch_nll(q_bin, p)[0], torch_nll(q, p_bin)[0]])
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert 0 <= float(metrics["correct_parametric"]) <= q.shape[0]


def test_vdr_loss_2term(qp, rng):
    q, p = qp
    q, p = np.abs(q), np.abs(p)
    q_bin = _random_bin(rng, q.shape)
    p_bin = _random_bin(rng, p.shape)
    cfg = VDRLossConfig(semi=False, sym_loss=False, topk=8)
    loss, _ = compute_vdr_loss(jnp.asarray(q), jnp.asarray(p),
                               jnp.asarray(q_bin), jnp.asarray(p_bin), cfg)
    from vsearch_tpu.train.loss import sparsify_with_lexical
    qt = np.asarray(sparsify_with_lexical(jnp.asarray(q),
                                          jnp.asarray(q_bin), 8))
    expected = np.mean([torch_nll(qt, p)[0], torch_nll(q_bin, p)[0]])
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_dpr_loss(qp):
    q, p = qp
    cfg = VDRLossConfig(sym_loss=True)
    loss, metrics = compute_dpr_loss(jnp.asarray(q), jnp.asarray(p), cfg)
    tloss, _ = torch_sym_nll(q, p)
    np.testing.assert_allclose(float(loss), tloss, rtol=1e-5)


def test_cts_mask_path_runs(qp, rng):
    q, p = qp
    q, p = np.abs(q), np.abs(p)
    q_bin = _random_bin(rng, q.shape)
    p_bin = _random_bin(rng, p.shape)
    cfg = VDRLossConfig(semi=True, sym_loss=True, cts_mask=True,
                        cts_mask_weight=0.5, topk=8)
    loss, _ = compute_vdr_loss(jnp.asarray(q), jnp.asarray(p),
                               jnp.asarray(q_bin), jnp.asarray(p_bin), cfg)
    assert np.isfinite(float(loss))
