"""Optimizer and LR schedules.

Counterpart of reference src/ir/training/model_utils.py:15-34 (AdamW with
no-decay groups for biases/LayerNorms) and :69-125 (linear / cosine /
warmup schedules), built on optax.
"""
from __future__ import annotations

from typing import Optional

import jax
import optax


def _no_decay_mask(params) -> dict:
    """True where weight decay applies: everything except biases and
    LayerNorm scales (reference model_utils.py:19-30)."""

    def decay(path, _):
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return last not in ("bias", "scale")

    return jax.tree_util.tree_map_with_path(decay, params)


def get_schedule_linear(warmup_steps: int, total_steps: int,
                        learning_rate: float,
                        steps_shift: int = 0) -> optax.Schedule:
    """Linear warmup then linear decay to ~0 (reference
    model_utils.py:69-90)."""

    def schedule(step):
        step = step + steps_shift
        warm = learning_rate * step / max(1, warmup_steps)
        frac = (total_steps - step) / max(1.0, total_steps - warmup_steps)
        decay = learning_rate * jax.numpy.maximum(frac, 1e-7 / learning_rate)
        return jax.numpy.where(step < warmup_steps, warm, decay)

    return schedule


def get_schedule_cosine(warmup_steps: int, total_steps: int,
                        learning_rate: float) -> optax.Schedule:
    """Linear warmup then cosine decay (reference model_utils.py:93-110)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=max(1, warmup_steps),
        decay_steps=max(2, total_steps))


def get_schedule_warmup(warmup_steps: int,
                        learning_rate: float) -> optax.Schedule:
    """Warmup then constant (reference model_utils.py:114-125)."""

    def schedule(step):
        warm = learning_rate * step / max(1, warmup_steps)
        return jax.numpy.where(step < warmup_steps, warm, learning_rate)

    return schedule


def get_optimizer(params, learning_rate=2e-5, adam_eps: float = 1e-8,
                  weight_decay: float = 0.0,
                  max_grad_norm: Optional[float] = 2.0,
                  schedule: Optional[optax.Schedule] = None
                  ) -> optax.GradientTransformation:
    """AdamW with no-decay param groups + optional global-norm clipping
    (clipping lives inside the optimizer here; the reference clips
    manually in the train loop, train_ir.py:170-172)."""
    lr = schedule if schedule is not None else learning_rate
    tx = optax.adamw(learning_rate=lr, eps=adam_eps,
                     weight_decay=weight_decay,
                     mask=_no_decay_mask(params) if weight_decay else None)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
