"""Contrastive losses for bi-encoder training.

TPU-native rebuild of the reference's loss stack (reference:
src/ir/training/loss_utils.py:16-224, 302-388). The reference's
``GatherLayer`` (autograd-aware NCCL all_gather for global in-batch
negatives, ddp_utils.py:98-117) disappears entirely: the whole step is one
pjit-compiled SPMD program over the global batch, so cross-device
negatives and their gradients come from XLA's partitioner by construction.

Batch layout (matching reference biencoder_utils.py:86-87): passages are
ordered [N positives] + [negatives...], so the positive for query ``i`` is
passage row ``i`` and every other row is a negative.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.sparse import build_cts_mask, build_topk_mask


@dataclasses.dataclass(frozen=True)
class VDRLossConfig:
    """Training-loss options (reference conf/train/*.yaml + loss_utils)."""

    semi: bool = True          # 4-term semi-parametric InfoNCE
    sym_loss: bool = True      # symmetric (q->p and p->q) CE
    scaled_loss: bool = False  # loss1 + (loss1/loss2).detach()*loss2
    temperature: float = 1.0
    topk: int = 768            # sparsification k for the *_topk terms
    cts_mask: bool = False     # contrastive vocab-slot regularizer
    cts_mask_weight: float = 1.0
    cts_mask_norm: bool = False


def biencoder_nll_loss(q_emb: jax.Array, p_emb: jax.Array
                       ) -> Tuple[jax.Array, jax.Array]:
    """In-batch softmax CE with positives on the leading diagonal
    (reference loss_utils.py:302-340). Returns (loss, correct_count)."""
    n = q_emb.shape[0]
    scores = q_emb @ p_emb.T  # [N, M]
    logprobs = jax.nn.log_softmax(scores, axis=1)
    targets = jnp.arange(n)
    loss = -jnp.take_along_axis(logprobs, targets[:, None], axis=1).mean()
    correct = (jnp.argmax(logprobs, axis=1) == targets).sum()
    return loss, correct


def symmetry_biencoder_nll_loss(q_emb: jax.Array, p_emb: jax.Array,
                                temperature: float = 1.0,
                                scaled_loss: bool = False
                                ) -> Tuple[jax.Array, jax.Array]:
    """Symmetric q->p + p->q CE (reference loss_utils.py:343-388).
    The p->q direction uses only the positive rows of p."""
    n = q_emb.shape[0]
    scores = q_emb @ p_emb.T  # [N, M]
    scores_t = scores.T[:n, :]  # positives-only transpose [N, N]
    targets = jnp.arange(n)

    logits_q = jax.nn.log_softmax(scores / temperature, axis=1)
    loss1 = -jnp.take_along_axis(logits_q, targets[:, None], axis=1).mean()
    correct = (jnp.argmax(logits_q, axis=1) == targets).sum()

    logits_p = jax.nn.log_softmax(scores_t / temperature, axis=1)
    loss2 = -jnp.take_along_axis(logits_p, targets[:, None], axis=1).mean()

    if scaled_loss:
        loss = loss1 + jax.lax.stop_gradient(loss1 / loss2) * loss2
    else:
        loss = loss1 + loss2
    return loss, correct


def _loss_fn(cfg: VDRLossConfig):
    if cfg.sym_loss:
        return lambda q, p: symmetry_biencoder_nll_loss(
            q, p, temperature=cfg.temperature, scaled_loss=cfg.scaled_loss)
    if cfg.temperature != 1.0 or cfg.scaled_loss:
        # reference parity: the asymmetric NLL has no temperature or
        # loss scaling (loss_utils.py:302-340) — warn instead of
        # silently training a different model than the config claims
        import logging

        logging.getLogger(__name__).warning(
            "temperature=%s / scaled_loss=%s apply only with "
            "sym_loss=true; the asymmetric NLL ignores them",
            cfg.temperature, cfg.scaled_loss)
    return biencoder_nll_loss


def sparsify_with_lexical(emb: jax.Array, bow: jax.Array, k: int
                          ) -> jax.Array:
    """topk(emb) OR lexical dims, then mask — the reference's
    ``fetch_global_vectors`` sparsification (loss_utils.py:16-19)."""
    mask = jnp.logical_or(build_topk_mask(emb, k=k), bow > 0)
    return emb * mask


def compute_vdr_loss(q_emb: jax.Array, p_emb: jax.Array, q_bin: jax.Array,
                     p_bin: jax.Array, cfg: VDRLossConfig
                     ) -> Tuple[jax.Array, dict]:
    """4-term (or 2-term) semi-parametric symmetric InfoNCE
    (reference loss_utils.py:109-207).

    q_emb [N, V], p_emb [M, V] (M = N * (1 + negs), positives first),
    q_bin/p_bin binary bag-of-words of the same shapes.
    Returns (loss, metrics dict with correct counts).
    """
    loss_func = _loss_fn(cfg)
    n = q_emb.shape[0]

    q_topk = sparsify_with_lexical(q_emb, q_bin, cfg.topk)
    p_topk = sparsify_with_lexical(p_emb, p_bin, cfg.topk)

    if cfg.semi:
        loss_1, correct_1 = loss_func(q_topk, p_emb)
        loss_2, correct_2 = loss_func(q_emb, p_topk)

        if cfg.cts_mask:
            # vocab-slot regularizer (loss_utils.py:179-191): activate
            # per-row unused slots in the binary views, deactivate them in
            # the dense opposite view
            q_emb_r, p_emb_r = q_emb, p_emb
            cts_q = build_cts_mask(q_bin)  # [N, V]
            deact_p = jnp.ones_like(p_emb).at[:n].set(
                1.0 - cts_q.astype(p_emb.dtype))
            cts_qf = cts_q.astype(q_emb.dtype)
            if cfg.cts_mask_norm:
                cts_qf = cts_qf / jnp.maximum(
                    jnp.linalg.norm(cts_qf, axis=-1, keepdims=True), 1e-12)
            q_bin = q_bin + cts_qf * cfg.cts_mask_weight
            p_emb_r = p_emb_r * deact_p

            cts_p = build_cts_mask(p_bin)  # [M, V]
            deact_q = 1.0 - cts_p[:n].astype(q_emb.dtype)
            cts_pf = cts_p.astype(p_emb.dtype)
            if cfg.cts_mask_norm:
                cts_pf = cts_pf / jnp.maximum(
                    jnp.linalg.norm(cts_pf, axis=-1, keepdims=True), 1e-12)
            p_bin = p_bin + cts_pf * cfg.cts_mask_weight
            q_emb_r = q_emb_r * deact_q

            loss_3, correct_3 = loss_func(q_bin, p_emb_r)
            loss_4, correct_4 = loss_func(q_emb_r, p_bin)
        else:
            loss_3, correct_3 = loss_func(q_bin, p_emb)
            loss_4, correct_4 = loss_func(q_emb, p_bin)

        loss = (loss_1 + loss_2 + loss_3 + loss_4) / 4
        correct_para = (correct_1 + correct_2) / 2
        correct_semi = (correct_3 + correct_4) / 2
    else:
        loss_1, correct_1 = loss_func(q_topk, p_emb)
        loss_2, correct_2 = loss_func(q_bin, p_emb)
        loss = (loss_1 + loss_2) / 2
        correct_para = correct_1
        correct_semi = correct_2

    return loss, {"correct_parametric": correct_para,
                  "correct_semiparametric": correct_semi,
                  "batch_size": jnp.asarray(n)}


def compute_dpr_loss(q_emb: jax.Array, p_emb: jax.Array,
                     cfg: VDRLossConfig) -> Tuple[jax.Array, dict]:
    """Dense InfoNCE (reference loss_utils.py:211-224)."""
    loss, correct = _loss_fn(cfg)(q_emb, p_emb)
    return loss, {"correct_parametric": correct,
                  "correct_semiparametric": correct,
                  "batch_size": jnp.asarray(q_emb.shape[0])}
