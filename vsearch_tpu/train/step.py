"""The pjit-compiled training step.

Replaces the reference's hot loop (reference: train_ir.py:107-202 +
loss_utils.py:25-105): one SPMD XLA program computes both encoder
forwards, bag-of-words masks, the 4-term semi-parametric InfoNCE over
global in-batch negatives, gradients, clipping and the AdamW update.
Data parallelism = batch sharded over the mesh's ``dp`` axis; the
vocab-space projection/score matrices may additionally shard over ``tp``.
No GatherLayer, no gradient hooks, no GradScaler (bf16 needs no loss
scaling on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.sparse import build_bow_mask
from .loss import VDRLossConfig, compute_dpr_loss, compute_vdr_loss


class TrainBatch(NamedTuple):
    """Device-side batch: queries [N, Lq], passages [M, Lp] with positives
    in the first N rows (reference biencoder_utils.py:86-87)."""

    q_ids: jax.Array
    p_ids: jax.Array


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx):
        # copy so the caller's arrays survive buffer donation by the
        # jitted step (donate_argnums=0)
        params = jax.tree_util.tree_map(jnp.array, params)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params), tx=tx)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state,
                                          self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params,
                                                       updates),
                            opt_state=new_opt)


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    encoder_type: str = "vdr"  # 'vdr' | 'dpr'
    vocab_size: int = 30522
    shift_vocab_num: int = 999
    norm_bow: bool = False
    loss: VDRLossConfig = dataclasses.field(default_factory=VDRLossConfig)


def make_train_step(apply_q: Callable, apply_p: Callable,
                    cfg: TrainStepConfig,
                    mesh: Optional[Mesh] = None,
                    shared_params: bool = False) -> Callable:
    """Build the jitted train step.

    apply_q/apply_p: fns (params, ids, token_type_ids, attention_mask,
    dropout_rng) -> embeddings. With ``shared_params`` both receive the
    same tree (reference shared_encoder, biencoder.py:57-59).
    """

    def step_fn(state: TrainState, batch: TrainBatch, rng: jax.Array):
        rq, rp = jax.random.split(rng)

        def loss_fn(params):
            p_q = params if shared_params else params["q"]
            p_p = params if shared_params else params["p"]
            q_emb = apply_q(p_q, batch.q_ids, rq)
            p_emb = apply_p(p_p, batch.p_ids, rp)
            if mesh is not None:
                spec = NamedSharding(mesh, P("dp", "tp"))
                q_emb = jax.lax.with_sharding_constraint(q_emb, spec)
                p_emb = jax.lax.with_sharding_constraint(p_emb, spec)
            if cfg.encoder_type == "vdr":
                q_bin = build_bow_mask(batch.q_ids,
                                       vocab_size=cfg.vocab_size,
                                       shift_num=cfg.shift_vocab_num,
                                       norm=cfg.norm_bow,
                                       dtype=q_emb.dtype)
                p_bin = build_bow_mask(batch.p_ids,
                                       vocab_size=cfg.vocab_size,
                                       shift_num=cfg.shift_vocab_num,
                                       norm=cfg.norm_bow,
                                       dtype=p_emb.dtype)
                loss, metrics = compute_vdr_loss(q_emb, p_emb, q_bin,
                                                 p_bin, cfg.loss)
            elif cfg.encoder_type == "dpr":
                loss, metrics = compute_dpr_loss(q_emb, p_emb, cfg.loss)
            else:
                raise NotImplementedError(cfg.encoder_type)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is not None:
        batch_sh = NamedSharding(mesh, P("dp"))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            in_shardings=(None,
                          TrainBatch(q_ids=batch_sh, p_ids=batch_sh),
                          repl),
            donate_argnums=0,
        )
    return jax.jit(step_fn, donate_argnums=0)


def make_encoder_apply(module, deterministic: bool = False,
                       remat: bool = False) -> Callable:
    """Wrap a flax encoder module into the (params, ids, rng) -> emb
    signature used by the train step. Attention mask and token types are
    derived on-device (ids != 0, zeros — reference loss_utils.py:38-41).

    ``remat=True`` rematerializes the forward in the backward pass
    (jax.checkpoint) — the VDR head's [B, L, V'] projection logits are
    the dominant training activation (~1 GB at B=32, L=256), so remat
    trades one extra forward for that memory.
    """

    def apply(params, ids, rng):
        ttype = jnp.zeros_like(ids)
        mask = (ids != 0).astype(jnp.int32)
        kwargs = {}
        if not deterministic:
            kwargs = {"rngs": {"dropout": rng}}
        return module.apply({"params": params}, ids, ttype, mask,
                            deterministic=deterministic, **kwargs)

    if remat:
        return jax.checkpoint(apply)
    return apply
